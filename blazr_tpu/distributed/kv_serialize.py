"""KV-cache / tensor wire serialization.

TPU-native port of boostr ``kv_serialize`` (SURVEY §2.9; used by the
disaggregated prefill→decode KV transfer, cli/disaggregated_forward.rs).
Hand-rolled little-endian format (NOT pickle — payloads cross the
network):

    [u32 n_arrays] then per array:
    [u8 dtype_code][u8 ndim][u64 dims...][u64 nbytes][raw bytes]
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

_DTYPES = [np.dtype(x) for x in
           ("float32", "float16", "int32", "int64", "uint32", "uint8", "bool")]
try:
    import ml_dtypes

    _DTYPES.append(np.dtype(ml_dtypes.bfloat16))
except ImportError:  # pragma: no cover
    pass
_CODE = {dt: i for i, dt in enumerate(_DTYPES)}

MAX_KV_TRANSFER_BYTES = 2 << 30   # reference cap 2 GiB (disaggregated.rs:93)


def serialize_arrays(arrays: Sequence[np.ndarray],
                     max_bytes: int = MAX_KV_TRANSFER_BYTES) -> bytes:
    out = bytearray(struct.pack("<I", len(arrays)))
    total = 0
    for a in arrays:
        a = np.ascontiguousarray(a)
        code = _CODE.get(a.dtype)
        if code is None:
            raise TypeError(f"unsupported dtype {a.dtype}")
        total += a.nbytes
        if total > max_bytes:
            raise ValueError(
                f"KV transfer exceeds cap: {total} > {max_bytes} bytes")
        out += struct.pack("<BB", code, a.ndim)
        out += struct.pack(f"<{a.ndim}Q", *a.shape)
        out += struct.pack("<Q", a.nbytes)
        out += a.tobytes()
    return bytes(out)


def deserialize_arrays(data: bytes) -> list[np.ndarray]:
    (n,) = struct.unpack_from("<I", data, 0)
    pos = 4
    out = []
    for _ in range(n):
        code, ndim = struct.unpack_from("<BB", data, pos)
        pos += 2
        shape = struct.unpack_from(f"<{ndim}Q", data, pos)
        pos += 8 * ndim
        (nbytes,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        arr = np.frombuffer(data, dtype=_DTYPES[code], count=nbytes //
                            _DTYPES[code].itemsize, offset=pos).reshape(shape)
        pos += nbytes
        out.append(arr.copy())
    return out


def serialize_kv_cache(cache) -> bytes:
    """Contiguous KVCache → bytes (reference serialize_kv_cache).

    int8 caches append their scale planes (wire format is
    self-describing: 3 arrays = float cache, 5 = quantized)."""
    arrays = [np.asarray(cache.k), np.asarray(cache.v),
              np.asarray(cache.length).astype(np.int32)]
    if getattr(cache, "k_scale", None) is not None:
        arrays += [np.asarray(cache.k_scale), np.asarray(cache.v_scale)]
    return serialize_arrays(arrays)


def deserialize_kv_cache(data: bytes):
    from ..kvcache.contiguous import KVCache
    import jax.numpy as jnp

    arrays = deserialize_arrays(data)
    k, v, length = arrays[:3]
    scales = {}
    if len(arrays) == 5:
        scales = dict(k_scale=jnp.asarray(arrays[3]),
                      v_scale=jnp.asarray(arrays[4]))
    return KVCache(k=jnp.asarray(k), v=jnp.asarray(v),
                   length=jnp.asarray(length, dtype=jnp.int32), **scales)
