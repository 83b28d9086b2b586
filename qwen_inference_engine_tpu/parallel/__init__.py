from qwen_inference_engine_tpu.parallel.mesh import make_mesh  # noqa: F401
from qwen_inference_engine_tpu.parallel.sharding import (  # noqa: F401
    cache_pspecs,
    param_pspecs,
    shard_params,
    shard_params_with_fn,
)
