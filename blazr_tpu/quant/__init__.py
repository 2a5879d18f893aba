from .qtensor import (
    CANONICAL_GGML_TYPES,
    QuantTensor,
    dequantize_jnp,
    dequantize_np,
    from_awq,
    from_ggml,
    from_gptq,
    unpack_k,
)
from .matmul import quant_matmul

__all__ = [
    "CANONICAL_GGML_TYPES",
    "QuantTensor",
    "dequantize_jnp",
    "dequantize_np",
    "from_awq",
    "from_ggml",
    "from_gptq",
    "quant_matmul",
    "unpack_k",
]
