"""Expert-parallel MoE all-to-all routing vs the single-device oracle.

Runs on the virtual CPU mesh (conftest forces 8 host devices); the routed
program must reproduce models.qwen.moe_mlp bitwise-nearly-bit — same
top-k, same grouping, no token dropping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.parallel.ep_moe import ep_moe_layer


def _mesh(n):
    devs = jax.devices()[:n]
    return Mesh(np.asarray(devs), ("ep",))


@pytest.mark.parametrize("ep,E,top_k", [(4, 8, 2), (2, 8, 3), (8, 8, 2)])
def test_ep_moe_matches_single_device(ep, E, top_k):
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.models.qwen import moe_mlp

    N, D, Fm = 24, 64, 32
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5

    ref = moe_mlp(h, router, wg, wu, wd, top_k, True, layer=0)

    mesh = _mesh(ep)
    pspec_h = P("ep", None)
    pspec_w = P(None, "ep", None, None)

    @jax.jit
    def run(h, router, wg, wu, wd):
        def fn(h, router, wg, wu, wd):
            return ep_moe_layer(h, router, wg[0], wu[0], wd[0], top_k, True,
                                "ep")
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(pspec_h, P(None, None), pspec_w, pspec_w, pspec_w),
            out_specs=pspec_h)(h, router, wg, wu, wd)

    got = run(h, router, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_moe_skewed_routing_no_drops():
    """A router biased so nearly all tokens hit one device's experts must
    still route exactly (capacity = worst case, never drops)."""
    ep, E, top_k = 4, 8, 2
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.models.qwen import moe_mlp

    N, D, Fm = 16, 64, 32
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    # bias experts 0 and 1 (both on device 0) hard
    router = router.at[:, 0].add(8.0).at[:, 1].add(8.0)
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5

    ref = moe_mlp(h, router, wg, wu, wd, top_k, False, layer=0)
    mesh = _mesh(ep)

    @jax.jit
    def run(h, router, wg, wu, wd):
        def fn(h, router, wg, wu, wd):
            return ep_moe_layer(h, router, wg[0], wu[0], wd[0], top_k, False,
                                "ep")
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("ep", None), P(None, None), P(None, "ep", None, None),
                      P(None, "ep", None, None), P(None, "ep", None, None)),
            out_specs=P("ep", None))(h, router, wg, wu, wd)

    got = run(h, router, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_moe_quantized_experts():
    """EP routing over QUANTIZED expert shards: the Pallas grouped dequant
    kernel (interpret mode) inside shard_map, vs the dequant oracle."""
    import contextlib
    from unittest import mock

    import qwen_inference_engine_tpu.ops.grouped_matmul as gm
    from qwen_inference_engine_tpu.models.qwen import moe_mlp
    from qwen_inference_engine_tpu.ops.linear import Linear
    from qwen_inference_engine_tpu.quant.quantize import quantize_linear

    ep, E, top_k = 2, 4, 2
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    N, D, Fm = 16, 256, 128
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5
    qg = quantize_linear(Linear(w=wg), 8, 128)
    qu = quantize_linear(Linear(w=wu), 8, 128)
    qd = quantize_linear(Linear(w=wd), 8, 128)

    # oracle: single-device quantized moe (xla fallback)
    ref = moe_mlp(h, router, qg, qu, qd, top_k, True, layer=0,
                  use_pallas=False)

    mesh = _mesh(ep)
    import dataclasses

    def shard_q(q):  # expert axis is dim 1 of q/scales
        return dataclasses.replace(
            q, q=jax.device_put(q.q, NamedSharding(mesh, P(None, "ep", None, None))),
            scales=jax.device_put(q.scales,
                                  NamedSharding(mesh, P(None, "ep", None, None))))

    qg_s, qu_s, qd_s = map(shard_q, (qg, qu, qd))

    @contextlib.contextmanager
    def interpret_pallas(module):
        orig = module.pl.pallas_call

        def call(*a, **k):
            k.pop("compiler_params", None)
            k["interpret"] = True
            return orig(*a, **k)

        with mock.patch.object(module.pl, "pallas_call", call):
            yield

    def run(h, router, qg, qu, qd):
        def fn(h, router, qg, qu, qd):
            import dataclasses as dc
            mk = lambda q: dc.replace(q, q=q.q[0], scales=q.scales[0])
            return ep_moe_layer(h, router, mk(qg), mk(qu), mk(qd), top_k,
                                True, "ep", use_quant_kernel=True)
        qspec = dataclasses.replace(
            qg, q=P(None, "ep", None, None), scales=P(None, "ep", None, None))
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("ep", None), P(None, None), qspec, qspec, qspec),
            out_specs=P("ep", None),
            check_vma=False)(h, router, qg, qu, qd)

    with interpret_pallas(gm):
        got = jax.jit(run)(h, router, qg_s, qu_s, qd_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
