from qwen_inference_engine_tpu.engine.engine import Engine, GenerationResult  # noqa: F401
from qwen_inference_engine_tpu.engine.scheduler import (  # noqa: F401
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.engine.speculative import (  # noqa: F401
    generate_speculative,
)
