"""Execute the production `ragged_all_to_all` EP branch on real TPU.

XLA:CPU has no ragged-all-to-all thunk, so every CPU test and the
virtual-mesh dryrun runs ep_moe_layer's dense-padded fallback — leaving
the production collective zero-times-executed (VERDICT r3 §2c). A TPU
mesh of ANY size compiles the real thunk; this probe runs both branches
on a 1-device TPU mesh and checks them against the single-device
moe_mlp grouping, bitwise-comparing ragged vs dense.

Usage: python scripts/probe_ep_ragged.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from qwen_inference_engine_tpu.models.qwen import moe_mlp
from qwen_inference_engine_tpu.parallel.ep_moe import ep_moe_layer

assert jax.default_backend() == "tpu", "this probe needs the real chip"
dev = jax.devices()[:1]
mesh = Mesh(np.array(dev), ("ep",))
print(f"probe_ep_ragged on {dev[0].device_kind} (1-device ep mesh)",
      flush=True)

N, D, E, Fm, top_k = 64, 256, 8, 512, 2
rng = np.random.default_rng(5)
h = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
router_w = jnp.asarray(rng.normal(size=(D, E)) * 0.1, jnp.float32)
w_gate = jnp.asarray(rng.normal(size=(E, D, Fm)) * 0.05, jnp.bfloat16)
w_up = jnp.asarray(rng.normal(size=(E, D, Fm)) * 0.05, jnp.bfloat16)
w_down = jnp.asarray(rng.normal(size=(E, Fm, D)) * 0.05, jnp.bfloat16)

# moe_mlp takes layer-stacked expert weights ([L, E, K, N], layer=0)
ref = moe_mlp(h, router_w, w_gate[None], w_up[None], w_down[None],
              top_k, True)


def run(ragged):
    fn = jax.shard_map(
        functools.partial(ep_moe_layer, top_k=top_k, norm_topk=True,
                          axis="ep", ragged=ragged),
        mesh=mesh,
        in_specs=(P("ep"), P(), P("ep"), P("ep"), P("ep")),
        out_specs=P("ep"),
    )
    return jax.jit(fn)(h, router_w, w_gate, w_up, w_down)


got_ragged = np.asarray(run(True).astype(jnp.float32))
got_dense = np.asarray(run(False).astype(jnp.float32))
ref_np = np.asarray(ref.astype(jnp.float32))

err_r = float(np.max(np.abs(got_ragged - ref_np)))
err_d = float(np.max(np.abs(got_ragged - got_dense)))
print(f"ragged_all_to_all branch vs moe_mlp: max|err| = {err_r:.3e}",
      flush=True)
print(f"ragged vs dense branch:              max|err| = {err_d:.3e}",
      flush=True)
assert err_r < 0.1 and err_d == 0.0
print("OK: production ragged_all_to_all branch compiled and executed "
      "on TPU, bitwise-matching the dense fallback", flush=True)
