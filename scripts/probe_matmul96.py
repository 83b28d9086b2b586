"""Pure per-layer matmul-chain time at M=96 (is the 11.9ms non-attention
step cost matmul-bound or dispatch/glue-bound?)."""
import sys
sys.path.insert(0, "."); sys.path.insert(0, "scripts")
import jax, jax.numpy as jnp, numpy as np, time
from qwen_inference_engine_tpu.config import ModelConfig
import qwen_inference_engine_tpu.models.qwen as qw
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
params = qw.init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                  group_size=256, quantize_lm_head=True,
                                  pad_free=True)
jax.block_until_ready(params)
M = int(sys.argv[1]) if len(sys.argv) > 1 else 96
ly = params["layers"]

def one_layer(ly, params, x, l):
    h = x
    q = quant_matmul_pallas(h, ly["q"], layer=l)
    k = quant_matmul_pallas(h, ly["k"], layer=l)
    v = quant_matmul_pallas(h, ly["v"], layer=l)
    o = quant_matmul_pallas(q, ly["o"], layer=l)
    g = quant_matmul_pallas(h + o, ly["gate"], layer=l)
    u = quant_matmul_pallas(h, ly["up"], layer=l)
    d = quant_matmul_pallas(jax.nn.silu(g) * u, ly["down"], layer=l)
    return x + d

@jax.jit
def run(params, x):
    ly = params["layers"]
    def body(carry, l):
        return one_layer(ly, params, carry, l), None
    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers))
    logits = quant_matmul_pallas(x, params["lm_head"])
    return jnp.sum(logits.astype(jnp.float32))

x0 = jax.random.normal(jax.random.PRNGKey(1), (M, cfg.hidden_size), jnp.bfloat16)
np.asarray(run(params, x0))
def t(reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        r = run(params, x0)
    np.asarray(r); return time.perf_counter() - t0
lo, hi = t(4), t(16)
print(f"matmul-only step (M={M}): {(hi-lo)/12*1e3:.2f} ms "
      f"(qkv/o/gate/up/down x{cfg.num_layers} + lm_head)")
