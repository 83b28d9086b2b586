from qwen_inference_engine_tpu.models.qwen import (  # noqa: F401
    init_params,
    forward_hidden,
    prefill,
    decode_step,
    compute_logits,
    score_logits,
)
