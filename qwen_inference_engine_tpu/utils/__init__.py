from qwen_inference_engine_tpu.utils.metrics import Metrics  # noqa: F401
