from .qtensor import (
    CANONICAL_GGML_TYPES,
    QuantTensor,
    apply_quant_compute,
    dequantize_jnp,
    dequantize_np,
    from_awq,
    from_ggml,
    from_gptq,
    mark_act_quant,
    unpack_k,
    widen_to_int8,
)
from .matmul import quant_matmul

__all__ = [
    "CANONICAL_GGML_TYPES",
    "QuantTensor",
    "apply_quant_compute",
    "dequantize_jnp",
    "dequantize_np",
    "from_awq",
    "from_ggml",
    "from_gptq",
    "mark_act_quant",
    "quant_matmul",
    "unpack_k",
    "widen_to_int8",
]
