from .registry import Model, build_model
