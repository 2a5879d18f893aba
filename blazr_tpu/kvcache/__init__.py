from .contiguous import KVCache, advance, init_kv_cache, write_layer
