from qwen_inference_engine_tpu.kvcache.cache import (  # noqa: F401
    KVCache,
    PagedKVCache,
    contiguous_read,
    contiguous_write,
    paged_read,
    paged_write,
)
