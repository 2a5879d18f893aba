from .app import AppConfig, parse_dtype
from .generation import GenerationConfig
from .inference import InferenceConfig, SpeculativeDecodingConfig
from .model_config import (
    LAYER_ATTENTION,
    LAYER_MAMBA2,
    LAYER_MLA,
    LAYER_MLA_MOE,
    AttentionConfig,
    AudioConfig,
    MoeConfig,
    RopeScaling,
    SsmConfig,
    UniversalConfig,
    VisionConfig,
    universal_from_hf_config,
)
from .server import LatencySlo, ServerConfig
from .user import UserConfig, user_config_path

__all__ = [
    "AppConfig",
    "AttentionConfig",
    "AudioConfig",
    "GenerationConfig",
    "InferenceConfig",
    "LatencySlo",
    "LAYER_ATTENTION",
    "LAYER_MAMBA2",
    "LAYER_MLA",
    "LAYER_MLA_MOE",
    "MoeConfig",
    "RopeScaling",
    "ServerConfig",
    "SpeculativeDecodingConfig",
    "SsmConfig",
    "UniversalConfig",
    "UserConfig",
    "VisionConfig",
    "parse_dtype",
    "universal_from_hf_config",
    "user_config_path",
]
