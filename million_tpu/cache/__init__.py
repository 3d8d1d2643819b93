from million_tpu.cache.pq_cache import (  # noqa: F401
    PQCacheConfig,
    PQCacheLayerState,
    init_layer_state,
    init_state,
    prefill_update,
    decode_update,
    flush_window,
    cache_memory_bytes,
)
from million_tpu.cache.dense_cache import (  # noqa: F401
    DenseCacheConfig,
    init_dense_state,
    dense_prefill_update,
    dense_decode_update,
)
