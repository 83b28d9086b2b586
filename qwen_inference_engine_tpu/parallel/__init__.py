from qwen_inference_engine_tpu.parallel.mesh import make_mesh  # noqa: F401
from qwen_inference_engine_tpu.parallel.sharding import (  # noqa: F401
    cache_pspecs,
    param_pspecs,
    shard_params,
    shard_params_with_fn,
)
from qwen_inference_engine_tpu.parallel.pp_step import (  # noqa: F401
    make_pp_forward_fn,
    shard_for_pp,
)
from qwen_inference_engine_tpu.parallel.tp_step import (  # noqa: F401
    make_tp_decode_fn,
    make_tp_prefill_fn,
    supports_tp,
)
