from qwen_inference_engine_tpu.quant.quantize import (  # noqa: F401
    QuantConfig,
    quantize_linear,
    quantize_params,
    pack_int4,
)
from qwen_inference_engine_tpu.quant.kv_quant import (  # noqa: F401
    quantize_kv,
    dequantize_kv,
)
