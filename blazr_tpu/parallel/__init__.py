from .mesh import MeshConfig, make_mesh, replicated, validate_tp_size
from .tp import (
    data_spec,
    kv_cache_spec,
    llama_param_specs,
    maybe_serving_mesh,
    shard_cache,
    shard_paged_cache,
    shard_params,
    validate_quant_tp,
)
