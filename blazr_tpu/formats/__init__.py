from .detect import (
    ModelFormat,
    ModelSource,
    QuantMethod,
    detect_model_source,
    detect_st_quant_method,
    read_quant_group_size,
)
from .detect_arch import (
    DetectedConfig,
    detect_architecture_from_names,
    infer_config_from_shapes,
)
from .gguf import GGML_BLOCK_INFO, Gguf, GgmlType, GgufTensorInfo, write_gguf
from .ggml_quants import dequantize_ggml, quantize_ggml, supported_quant_types
from .names import gguf_to_hf_name, hf_to_gguf_name
from .safetensors import SafeTensorsReader, TensorInfo, write_safetensors

__all__ = [
    "DetectedConfig",
    "GGML_BLOCK_INFO",
    "Gguf",
    "GgmlType",
    "GgufTensorInfo",
    "ModelFormat",
    "ModelSource",
    "QuantMethod",
    "SafeTensorsReader",
    "TensorInfo",
    "dequantize_ggml",
    "detect_architecture_from_names",
    "detect_model_source",
    "detect_st_quant_method",
    "gguf_to_hf_name",
    "hf_to_gguf_name",
    "infer_config_from_shapes",
    "quantize_ggml",
    "read_quant_group_size",
    "supported_quant_types",
    "write_gguf",
    "write_safetensors",
]
