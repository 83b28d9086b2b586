from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear, apply_linear  # noqa: F401
from qwen_inference_engine_tpu.ops.norms import rms_norm, qk_norm  # noqa: F401
from qwen_inference_engine_tpu.ops.rope import precompute_rope, apply_rope  # noqa: F401
