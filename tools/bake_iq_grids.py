"""Bake the official ggml IQ codebook grids into package data.

The IQ1/IQ2/IQ3 grid-codebook quant formats decode through hand-curated
E8/D4-lattice point tables that ggml publishes only as C constant arrays
(`ggml-common.h` in a llama.cpp/ggml checkout). They are pure constant
data (~30 KB) but are not algorithmically derivable, so this build
environment (no network, no llama.cpp checkout) cannot synthesize them.

Usage:
    python tools/bake_iq_grids.py /path/to/llama.cpp [--out OUT.npz]

Finds `ggml-common.h` (or any file containing the tables) under the
given tree, parses the constant arrays, normalizes them to the package's
grid representation, and writes `blazr_tpu/formats/data/iq_grids.npz`
(the location `formats/iq_quants.py` loads at import, making every
decoder canonical with no env var). Verification: reload + fingerprint
printed; `tests/test_iq_quants.py` external-grid interop then passes
with no `BLAZR_TPU_IQ_GRIDS` override.

Package representation (keys in the npz):
    iq2xxs_grid [256, 8] uint8   iq2xs_grid [512, 8]   iq2s_grid [1024, 8]
    iq3xxs_grid [256, 4] uint8   iq3s_grid  [512, 4]
    iq1s_grid   [2048, 8] uint8 in {0, 1, 2}  (= value + 1)
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

# table name in C source -> (entries, elem_ctype, bytes_per_entry)
TABLES = {
    "iq2xxs_grid": (256, "uint64_t", 8),
    "iq2xs_grid": (512, "uint64_t", 8),
    "iq2s_grid": (1024, "uint64_t", 8),
    "iq3xxs_grid": (256, "uint32_t", 4),
    "iq3s_grid": (512, "uint32_t", 4),
    "iq1s_grid": (2048, "uint64_t", 8),
}


def parse_c_table(src: str, name: str, n_entries: int,
                  elem_bytes: int) -> np.ndarray:
    """Parse `... name[...] = { 0x..., ... };` into [n, elem_bytes] uint8
    (little-endian byte expansion of each element)."""
    m = re.search(
        rf"\b{name}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;", src, re.DOTALL)
    if not m:
        raise ValueError(f"table {name} not found")
    vals = [int(tok, 0) for tok in
            re.findall(r"0[xX][0-9a-fA-F]+|\d+", m.group(1))]
    if len(vals) != n_entries:
        raise ValueError(
            f"{name}: expected {n_entries} entries, parsed {len(vals)}")
    arr = np.asarray(vals, dtype=np.uint64)
    out = np.empty((n_entries, elem_bytes), dtype=np.uint8)
    for j in range(elem_bytes):
        out[:, j] = ((arr >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(
            np.uint8)
    return out


def normalize_iq1s(grid: np.ndarray) -> np.ndarray:
    """ggml's iq1s bytes encode {-1, 0, 1}; the package stores {0, 1, 2}
    (= value + 1). Handle both the signed (0xFF = -1) and the pre-shifted
    encodings."""
    if (grid == 0xFF).any():                      # signed int8 bytes
        return (grid.astype(np.int8).astype(np.int16) + 1).astype(np.uint8)
    if grid.max() <= 2:                           # already {0,1,2}
        return grid
    raise ValueError(
        f"unrecognized iq1s value alphabet: {sorted(set(grid.ravel().tolist()))[:8]}")


def find_source(root: str) -> str:
    """Concatenate every candidate source file containing the tables."""
    hits = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith((".h", ".c", ".cpp", ".cu", ".inc")):
                p = os.path.join(dirpath, fn)
                try:
                    with open(p, errors="ignore") as f:
                        s = f.read()
                except OSError:
                    continue
                if "iq2xxs_grid" in s:
                    hits.append(s)
    if not hits:
        raise SystemExit(f"no file under {root} defines iq2xxs_grid "
                         f"(need a llama.cpp/ggml checkout)")
    return "\n".join(hits)


def bake(src: str) -> dict[str, np.ndarray]:
    grids = {}
    for name, (n, _ctype, ebytes) in TABLES.items():
        g = parse_c_table(src, name, n, ebytes)
        if name == "iq1s_grid":
            g = normalize_iq1s(g)
        if name.startswith("iq3"):
            pass                                   # 4-byte entries, as-is
        grids[name] = g
    return grids


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("tree", help="llama.cpp / ggml checkout root")
    default_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "blazr_tpu", "formats", "data",
                               "iq_grids.npz")
    ap.add_argument("--out", default=default_out)
    args = ap.parse_args()

    grids = bake(find_source(args.tree))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **grids)

    # Verify: force a fresh import against the baked file.
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    os.environ.pop("BLAZR_TPU_IQ_GRIDS", None)
    from blazr_tpu.formats import iq_quants

    assert iq_quants.grids_are_canonical(), iq_quants.GRIDS_SOURCE
    print(f"baked {args.out}: "
          f"{ {k: v.shape for k, v in grids.items()} } "
          f"fingerprint={iq_quants.grids_fingerprint()}")


if __name__ == "__main__":
    main()
