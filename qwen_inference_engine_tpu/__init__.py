"""TPU-native Qwen inference engine.

A brand-new JAX/XLA/Pallas inference framework with the capabilities of the
reference CUDA engine (Rafae1130/qwen_inference_engine, see SURVEY.md):
config-driven Qwen2/2.5/3 forward with GQA + qk-norm + rotate-half RoPE,
paged & contiguous KV caches, INT8/INT4 weight-only quantization with fused
dequant-matmul Pallas kernels, an INT8 KV cache, a jitted prefill/decode
engine loop with continuous batching, top-k/top-p/temperature sampling with
repetition penalty, a sharded safetensors loader, and tensor sharding over
multi-host TPU meshes via NamedSharding/pjit.
"""

__version__ = "0.1.0"

from qwen_inference_engine_tpu.config import ModelConfig, PRESETS  # noqa: F401
