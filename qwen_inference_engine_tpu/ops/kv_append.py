"""In-place decode KV append into the stacked contiguous cache.

XLA lowers the per-row scatter ``cache.at[l, b, :, pos_b].set(new)`` to a
serial per-batch-row read-modify-write (~6.8 ms/step at 7B batch 128,
ablation in scripts/ablate_decode.py). HBM buffers are (8, 128)-tiled along
(S, D), so a 1-row DMA is impossible; but when every sequence decodes at
the SAME position (aligned batch — the common serving fast path and the
bench configuration), the whole batch's append is ONE tile-aligned
read-modify-write: DMA in the [B, Hk, 8, D] tile band containing ``pos``,
blend the new row with a vectorized select, DMA it back. The cache aliases
the output (``input_output_aliases``) so the update is in place.

TPU equivalent of the reference's per-token decode append (reference:
layers/src/include_cuda.cu:233-279 — two cudaMemcpys per layer per token),
but for the whole batch at once and without leaving the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_append_kernel(pos_ref, layer_ref, kc_hbm, vc_hbm, kn_ref, vn_ref,
                           kc_out, vc_out, ktile, vtile, sem, *, nrows):
    del kc_hbm, vc_hbm  # aliased with kc_out / vc_out
    l = layer_ref[0]
    p = pos_ref[0]
    t0 = pl.multiple_of((p // 8) * 8, 8)
    # dynamic row window (pipeline decode appends one microbatch's rows of
    # the full stacked cache per tick — zero slice copies, ROADMAP #6)
    rows = pl.ds(pos_ref[1], nrows)

    kin = pltpu.make_async_copy(kc_out.at[l, rows, :, pl.ds(t0, 8), :], ktile,
                                sem.at[0])
    vin = pltpu.make_async_copy(vc_out.at[l, rows, :, pl.ds(t0, 8), :], vtile,
                                sem.at[1])
    kin.start()
    vin.start()
    kin.wait()
    vin.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape, dimension=2)
    sel = row == (p - t0)
    ktile[:] = jnp.where(sel, kn_ref[:][:, :, None, :], ktile[:])
    vtile[:] = jnp.where(sel, vn_ref[:][:, :, None, :], vtile[:])

    kout = pltpu.make_async_copy(ktile, kc_out.at[l, rows, :, pl.ds(t0, 8), :],
                                 sem.at[0])
    vout = pltpu.make_async_copy(vtile, vc_out.at[l, rows, :, pl.ds(t0, 8), :],
                                 sem.at[1])
    kout.start()
    vout.start()
    kout.wait()
    vout.wait()


@jax.jit
def kv_append_uniform(k_cache, v_cache, k_new, v_new, position, layer,
                      row0=0):
    """Write ``k_new/v_new [Bn, 1, Hk, D]`` at the SAME ``position`` (scalar)
    for rows [row0, row0+Bn) into the stacked head-major caches
    ``[L, B, Hk, S, D]`` (in place). ``row0`` may be a traced scalar
    (pipeline decode's per-tick microbatch window). Returns the (aliased)
    updated caches."""
    L, B, Hk, S, D = k_cache.shape
    Bn = k_new.shape[0]
    kn = k_new.reshape(Bn, Hk, D).astype(k_cache.dtype)
    vn = v_new.reshape(Bn, Hk, D).astype(v_cache.dtype)
    pos = jnp.stack([jnp.asarray(position, jnp.int32),
                     jnp.asarray(row0, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_cache (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bn, Hk, 8, D), k_cache.dtype),
            pltpu.VMEM((Bn, Hk, 8, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_uniform_append_kernel, nrows=Bn),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={2: 0, 3: 1},  # caches alias outputs
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pos, jnp.asarray(layer, jnp.int32).reshape(1),
      k_cache, v_cache, kn, vn)


# ----------------------------------------------------------------------
# INT8-KV variant: also updates the per-token-per-head scale arrays
# [L, B, Hk, S]. S is the LANE dim there, so the RMW band is the
# 128-lane tile containing pos (lane slices must be full tiles).
# ----------------------------------------------------------------------

def _uniform_append_q8_kernel(pos_ref, layer_ref, kc_hbm, vc_hbm, ks_hbm,
                              vs_hbm, kn_ref, vn_ref, ksn_ref, vsn_ref,
                              kc_out, vc_out, ks_out, vs_out,
                              ktile, vtile, kstile, vstile, sem, *, band,
                              nrows):
    del kc_hbm, vc_hbm, ks_hbm, vs_hbm
    l = layer_ref[0]
    p = pos_ref[0]
    rows = pl.ds(pos_ref[1], nrows)   # dynamic microbatch window (PP decode)
    # int8 HBM arrays tile (32, 128) along (S, D) — the RMW band must cover
    # a full sublane tile of the cache dtype, not the bf16 8-row band
    t0 = pl.multiple_of((p // band) * band, band)
    s0 = pl.multiple_of((p // 128) * 128, 128)

    cps = [
        pltpu.make_async_copy(kc_out.at[l, rows, :, pl.ds(t0, band), :], ktile,
                              sem.at[0]),
        pltpu.make_async_copy(vc_out.at[l, rows, :, pl.ds(t0, band), :], vtile,
                              sem.at[1]),
        pltpu.make_async_copy(ks_out.at[l, rows, :, pl.ds(s0, 128)], kstile,
                              sem.at[2]),
        pltpu.make_async_copy(vs_out.at[l, rows, :, pl.ds(s0, 128)], vstile,
                              sem.at[3]),
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape, dimension=2)
    sel = row == (p - t0)
    ktile[:] = jnp.where(sel, kn_ref[:][:, :, None, :], ktile[:])
    vtile[:] = jnp.where(sel, vn_ref[:][:, :, None, :], vtile[:])
    lane = jax.lax.broadcasted_iota(jnp.int32, kstile.shape, dimension=2)
    lsel = lane == (p - s0)
    kstile[:] = jnp.where(lsel, ksn_ref[:][:, :, None], kstile[:])
    vstile[:] = jnp.where(lsel, vsn_ref[:][:, :, None], vstile[:])

    cps = [
        pltpu.make_async_copy(ktile, kc_out.at[l, rows, :, pl.ds(t0, band), :],
                              sem.at[0]),
        pltpu.make_async_copy(vtile, vc_out.at[l, rows, :, pl.ds(t0, band), :],
                              sem.at[1]),
        pltpu.make_async_copy(kstile, ks_out.at[l, rows, :, pl.ds(s0, 128)],
                              sem.at[2]),
        pltpu.make_async_copy(vstile, vs_out.at[l, rows, :, pl.ds(s0, 128)],
                              sem.at[3]),
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()


@jax.jit
def kv_append_uniform_q8(k_cache, v_cache, k_scale, v_scale,
                         k_new, v_new, ks_new, vs_new, position, layer,
                         row0=0):
    """INT8-KV uniform append: k/v_new [Bn, 1, Hk, D] int8, ks/vs_new
    [Bn, 1, Hk] f32, same ``position`` for rows [row0, row0+Bn). ``row0``
    may be a traced scalar (PP decode). In place."""
    L, B, Hk, S, D = k_cache.shape
    Bn = k_new.shape[0]
    kn = k_new.reshape(Bn, Hk, D).astype(k_cache.dtype)
    vn = v_new.reshape(Bn, Hk, D).astype(v_cache.dtype)
    ksn = ks_new.reshape(Bn, Hk).astype(jnp.float32)
    vsn = vs_new.reshape(Bn, Hk).astype(jnp.float32)
    pos = jnp.stack([jnp.asarray(position, jnp.int32),
                     jnp.asarray(row0, jnp.int32)])
    band = 32 if k_cache.dtype.itemsize == 1 else 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((Bn, Hk, band, D), k_cache.dtype),
            pltpu.VMEM((Bn, Hk, band, D), v_cache.dtype),
            pltpu.VMEM((Bn, Hk, 128), jnp.float32),
            pltpu.VMEM((Bn, Hk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_uniform_append_q8_kernel, band=band, nrows=Bn),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (k_cache, v_cache, k_scale, v_scale)),
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pos, jnp.asarray(layer, jnp.int32).reshape(1),
      k_cache, v_cache, k_scale, v_scale, kn, vn, ksn, vsn)


# ----------------------------------------------------------------------
# All-layers deferred append: with the fresh-token merge in the attention
# kernel (ops/decode_attention.py), the per-layer appends no longer gate
# anything inside the layer scan — the step collects every layer's new
# K/V (tiny: [L, B, Hk, D]) and this kernel writes all of them in one
# call, double-buffering the tile bands across layers. Amortizes the
# per-call fixed cost (28 calls x ~40 us -> one call).
# ----------------------------------------------------------------------

def _append_all_kernel(pos_ref, kc_hbm, vc_hbm, kn_ref, vn_ref,
                       kc_out, vc_out, ktile, vtile, sem, *, n_layers):
    del kc_hbm, vc_hbm
    p = pos_ref[0]
    t0 = pl.multiple_of((p // 8) * 8, 8)

    def band_in(l, slot):
        return (
            pltpu.make_async_copy(kc_out.at[l, :, :, pl.ds(t0, 8), :],
                                  ktile.at[slot], sem.at[2 * slot]),
            pltpu.make_async_copy(vc_out.at[l, :, :, pl.ds(t0, 8), :],
                                  vtile.at[slot], sem.at[2 * slot + 1]),
        )

    def band_out(l, slot):
        return (
            pltpu.make_async_copy(ktile.at[slot],
                                  kc_out.at[l, :, :, pl.ds(t0, 8), :],
                                  sem.at[4 + 2 * slot]),
            pltpu.make_async_copy(vtile.at[slot],
                                  vc_out.at[l, :, :, pl.ds(t0, 8), :],
                                  sem.at[4 + 2 * slot + 1]),
        )

    row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape[1:], dimension=2)
    sel = row == (p - t0)

    for c in band_in(0, 0):
        c.start()
    for l in range(n_layers):  # static unroll: software-pipelined bands
        slot = l % 2
        nxt = (l + 1) % 2
        if l + 1 < n_layers:
            if l >= 1:
                # slot `nxt` last held layer l-1's band: its write-back
                # must land before the next band is DMA'd into it
                for c in band_out(l - 1, nxt):
                    c.wait()
            for c in band_in(l + 1, nxt):
                c.start()
        for c in band_in(l, slot):
            c.wait()
        ktile[slot] = jnp.where(sel, kn_ref[l][:, :, None, :], ktile[slot])
        vtile[slot] = jnp.where(sel, vn_ref[l][:, :, None, :], vtile[slot])
        for c in band_out(l, slot):
            c.start()
    for l in (n_layers - 2, n_layers - 1):
        if 0 <= l:
            for c in band_out(l, l % 2):
                c.wait()


@jax.jit
def kv_append_all_uniform(k_cache, v_cache, k_new, v_new, position):
    """Write every layer's fresh K/V row ([L, B, Hk, D]) at the SAME
    ``position`` into the stacked caches [L, B, Hk, S, D], in place."""
    L, B, Hk, S, D = k_cache.shape
    kn = k_new.reshape(L, B, Hk, D).astype(k_cache.dtype)
    vn = v_new.reshape(L, B, Hk, D).astype(v_cache.dtype)
    pos = jnp.asarray(position, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_cache (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new [L,B,Hk,D]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, Hk, 8, D), k_cache.dtype),
            pltpu.VMEM((2, B, Hk, 8, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    kernel = functools.partial(_append_all_kernel, n_layers=L)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={1: 0, 2: 1},  # caches alias outputs
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pos, k_cache, v_cache, kn, vn)

# ----------------------------------------------------------------------
# Ragged multi-token CONTIGUOUS append: the speculative verify forward
# writes T = k+1 consecutive fresh K/V rows per sequence, each sequence at
# its OWN start position (rows diverge as different rows accept different
# draft counts). One grid cell per batch row RMWs the tile band covering
# its [start, start+T) window — the XLA scatter alternative serializes
# per row (docs/PERF.md).
# ----------------------------------------------------------------------

def _ragged_t_kernel(pos_ref, layer_ref, kc_hbm, vc_hbm, kn_ref, vn_ref,
                     kc_out, vc_out, ktile, vtile, sem, *, T, band, span,
                     max_s):
    del kc_hbm, vc_hbm
    b = pl.program_id(0)
    l = layer_ref[0]
    p = pos_ref[b]

    @pl.when(p >= 0)
    def _():
        t0 = pl.multiple_of(
            jnp.minimum((p // band) * band, max_s - span), band)
        cps = [
            pltpu.make_async_copy(
                kc_out.at[l, b, :, pl.ds(t0, span), :], ktile, sem.at[0]),
            pltpu.make_async_copy(
                vc_out.at[l, b, :, pl.ds(t0, span), :], vtile, sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape, dimension=1)
        for o in range(T):           # T is small and static (spec_k+1)
            sel = row == (p - t0 + o)
            ktile[:] = jnp.where(sel, kn_ref[b, o][:, None, :], ktile[:])
            vtile[:] = jnp.where(sel, vn_ref[b, o][:, None, :], vtile[:])

        cps = [
            pltpu.make_async_copy(
                ktile, kc_out.at[l, b, :, pl.ds(t0, span), :], sem.at[0]),
            pltpu.make_async_copy(
                vtile, vc_out.at[l, b, :, pl.ds(t0, span), :], sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()


def kv_append_ragged_t(k_cache, v_cache, k_new, v_new, positions, layer):
    """Write ``k/v_new [B, T, Hk, D]`` at per-row start ``positions [B]``
    (row b's tokens land at positions[b] .. positions[b]+T-1) into the
    stacked head-major caches ``[L, B, Hk, S, D]``, in place. Rows with
    positions < 0 are skipped. Caller guarantees positions[b]+T <= S."""
    L, B, Hk, S, D = k_cache.shape
    T = k_new.shape[1]
    band = 32 if k_cache.dtype.itemsize == 1 else 8
    span = (-(-T // band) + 1) * band   # window + one alignment band
    kn = k_new.astype(k_cache.dtype)    # [B, T, Hk, D]
    vn = v_new.astype(v_cache.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_cache
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hk, span, D), k_cache.dtype),
            pltpu.VMEM((Hk, span, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ragged_t_kernel, T=T, band=band, span=span,
                          max_s=S),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(positions.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), k_cache, v_cache, kn, vn)


# ----------------------------------------------------------------------
# Ragged per-row PAGED append: continuous batching decodes every slot at a
# DIFFERENT position, which XLA lowers to a serial per-row scatter RMW
# (~6.8 ms/step at 7B b112, docs/PERF.md). This kernel gives each batch
# row one grid cell that RMWs just the tile band of its page — a handful
# of ~16 KB DMAs per row, in place through the aliased pool. Rows with
# position < 0 are skipped (inactive slots).
# ----------------------------------------------------------------------

def _paged_ragged_kernel(pos_ref, tables_ref, layer_ref, kc_hbm, vc_hbm,
                         kn_ref, vn_ref, kc_out, vc_out, ktile, vtile, sem,
                         *, page_size, band):
    del kc_hbm, vc_hbm
    b = pl.program_id(0)
    l = layer_ref[0]
    p = pos_ref[b]

    @pl.when(p >= 0)
    def _():
        page = tables_ref[b, p // page_size]
        slot = p % page_size
        t0 = pl.multiple_of((slot // band) * band, band)

        cps = [
            pltpu.make_async_copy(
                kc_out.at[l, page, :, pl.ds(t0, band), :], ktile, sem.at[0]),
            pltpu.make_async_copy(
                vc_out.at[l, page, :, pl.ds(t0, band), :], vtile, sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

        row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape, dimension=1)
        sel = row == (slot - t0)
        ktile[:] = jnp.where(sel, kn_ref[b][:, None, :], ktile[:])
        vtile[:] = jnp.where(sel, vn_ref[b][:, None, :], vtile[:])

        cps = [
            pltpu.make_async_copy(
                ktile, kc_out.at[l, page, :, pl.ds(t0, band), :], sem.at[0]),
            pltpu.make_async_copy(
                vtile, vc_out.at[l, page, :, pl.ds(t0, band), :], sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()


@functools.partial(jax.jit, static_argnames=("page_size",))
def paged_append_ragged(k_pages, v_pages, k_new, v_new, positions,
                        block_tables, layer, *, page_size):
    """Write ``k/v_new [B, 1, Hk, D]`` at per-row absolute ``positions [B]``
    through ``block_tables [B, max_pages]`` into the stacked page pools
    ``[L, P, Hk, page, D]`` (in place). positions < 0 skip the row."""
    L, P, Hk, PS, D = k_pages.shape
    B = k_new.shape[0]
    band = min(PS, 32 if k_pages.dtype.itemsize == 1 else 8)
    kn = k_new.reshape(B, Hk, D).astype(k_pages.dtype)
    vn = v_new.reshape(B, Hk, D).astype(v_pages.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_pages
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hk, band, D), k_pages.dtype),
            pltpu.VMEM((Hk, band, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_ragged_kernel, page_size=page_size,
                          band=band),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(positions.astype(jnp.int32), block_tables.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), k_pages, v_pages, kn, vn)


# ----------------------------------------------------------------------
# Ragged multi-token PAGED append: the speculative verify forward writes
# T = spec_k+1 consecutive fresh K/V rows per sequence, each row at its
# OWN start position (rows diverge as different rows accept different
# draft counts). One grid cell per batch row RMWs the tile band(s)
# covering its [start, start+T) window — at most two pages (T <= page);
# the XLA alternative scatters serially per row per token.
# ----------------------------------------------------------------------

def _paged_ragged_t_kernel(pos_ref, tables_ref, layer_ref, kc_hbm, vc_hbm,
                           kn_ref, vn_ref, kc_out, vc_out, ktile, vtile,
                           sem, *, T, page_size, band, span):
    del kc_hbm, vc_hbm
    b = pl.program_id(0)
    l = layer_ref[0]
    p = pos_ref[b]

    @pl.when(p >= 0)
    def _():
        slot0 = p % page_size

        def rmw(page, t0, off):
            # off = tile-relative slot of token 0; tokens whose in-page
            # slot falls outside [t0, t0+span) never match the row iota,
            # so page-boundary clipping is implicit.
            cps = [
                pltpu.make_async_copy(
                    kc_out.at[l, page, :, pl.ds(t0, span), :], ktile,
                    sem.at[0]),
                pltpu.make_async_copy(
                    vc_out.at[l, page, :, pl.ds(t0, span), :], vtile,
                    sem.at[1]),
            ]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            row = jax.lax.broadcasted_iota(jnp.int32, ktile.shape, 1)
            for o in range(T):  # T is small and static (spec_k+1)
                sel = row == off + o
                ktile[:] = jnp.where(sel, kn_ref[b, o][:, None, :], ktile[:])
                vtile[:] = jnp.where(sel, vn_ref[b, o][:, None, :], vtile[:])
            cps = [
                pltpu.make_async_copy(
                    ktile, kc_out.at[l, page, :, pl.ds(t0, span), :],
                    sem.at[0]),
                pltpu.make_async_copy(
                    vtile, vc_out.at[l, page, :, pl.ds(t0, span), :],
                    sem.at[1]),
            ]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()

        t0 = pl.multiple_of(
            jnp.minimum((slot0 // band) * band, page_size - span), band)
        rmw(tables_ref[b, p // page_size], t0, slot0 - t0)

        @pl.when(slot0 + T > page_size)
        def _():
            # straddle: the tail tokens land at page-1 slots [0, ...)
            rmw(tables_ref[b, p // page_size + 1], 0, slot0 - page_size)


@functools.partial(jax.jit, static_argnames=("page_size",))
def paged_append_ragged_t(k_pages, v_pages, k_new, v_new, positions,
                          block_tables, layer, *, page_size):
    """Write ``k/v_new [B, T, Hk, D]`` at per-row start ``positions [B]``
    (row b's tokens land at positions[b] .. positions[b]+T-1) through
    ``block_tables [B, max_pages]`` into the stacked page pools
    ``[L, P, Hk, page, D]``, in place. Rows with positions < 0 are
    skipped. Requires T <= page_size (window spans at most two pages);
    the caller guarantees the straddle page is allocated (the scheduler's
    admission budgets spec_k extra tokens per sequence)."""
    L, P, Hk, PS, D = k_pages.shape
    B, T = k_new.shape[:2]
    if T > PS:
        raise ValueError(f"append window T={T} exceeds page_size={PS}")
    band = min(PS, 32 if k_pages.dtype.itemsize == 1 else 8)
    span = min(PS, (T // band + 2) * band)
    kn = k_new.astype(k_pages.dtype)
    vn = v_new.astype(v_pages.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_pages
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hk, span, D), k_pages.dtype),
            pltpu.VMEM((Hk, span, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_ragged_t_kernel, T=T, page_size=page_size,
                          band=band, span=span),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(positions.astype(jnp.int32), block_tables.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), k_pages, v_pages, kn, vn)


# ----------------------------------------------------------------------
# Single-row PREFILL window append: a prefill piece writes T consecutive
# tokens of ONE sequence starting at `start`. The XLA scatter this
# replaces serializes per token AND pays a full [page, D] tile RMW per
# token, so its cost grows with page size (r4: 96 admissions of 1408
# tokens took 64.6 s at page 128 and 558 s at page 512). Here the new
# rows are host-aligned to page boundaries once, then one grid cell per
# touched page does a single tile RMW (read, mask-blend, write) with the
# aligned block pipelined in via BlockSpec.
# ----------------------------------------------------------------------

def _paged_prefill_kernel(start_ref, tables_ref, layer_ref, kc_hbm, vc_hbm,
                          kn_ref, vn_ref, kc_out, vc_out, ktile, vtile,
                          sem, *, page_size, T):
    del kc_hbm, vc_hbm
    i = pl.program_id(0)
    l = layer_ref[0]
    start = start_ref[0]
    first = start // page_size
    base = (first + i) * page_size

    @pl.when(base < start + T)
    def _():
        page = tables_ref[0, first + i]
        cps = [
            pltpu.make_async_copy(kc_out.at[l, page], ktile, sem.at[0]),
            pltpu.make_async_copy(vc_out.at[l, page], vtile, sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        pos = base + jax.lax.broadcasted_iota(
            jnp.int32, ktile.shape, dimension=1)
        sel = (pos >= start) & (pos < start + T)
        ktile[:] = jnp.where(sel, kn_ref[0], ktile[:])
        vtile[:] = jnp.where(sel, vn_ref[0], vtile[:])
        cps = [
            pltpu.make_async_copy(ktile, kc_out.at[l, page], sem.at[0]),
            pltpu.make_async_copy(vtile, vc_out.at[l, page], sem.at[1]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()


@functools.partial(jax.jit, static_argnames=("page_size",))
def paged_append_prefill(k_pages, v_pages, k_new, v_new, start,
                         block_tables, layer, *, page_size):
    """Write ``k/v_new [1, T, Hk, D]`` at consecutive positions
    ``start..start+T-1`` of ONE row through ``block_tables [1, max_pages]``
    into the stacked page pools ``[L, P, Hk, page, D]``, in place."""
    L, P, Hk, PS, D = k_pages.shape
    B, T = k_new.shape[:2]
    assert B == 1, "prefill window append is a single-row kernel"
    npw = -(-T // PS) + 1              # pages the window may touch
    start = jnp.asarray(start, jnp.int32).reshape(1)
    off = start[0] % PS
    # align the fresh rows to page boundaries once on the host side:
    # cell i's block is then a plain (i, ...) index map
    kn = jnp.zeros((Hk, npw * PS, D), k_pages.dtype)
    vn = jnp.zeros((Hk, npw * PS, D), v_pages.dtype)
    kn = jax.lax.dynamic_update_slice(
        kn, k_new[0].swapaxes(0, 1).astype(k_pages.dtype), (0, off, 0))
    vn = jax.lax.dynamic_update_slice(
        vn, v_new[0].swapaxes(0, 1).astype(v_pages.dtype), (0, off, 0))
    kn = kn.reshape(Hk, npw, PS, D).swapaxes(0, 1)   # [npw, Hk, PS, D]
    vn = vn.reshape(Hk, npw, PS, D).swapaxes(0, 1)

    def kn_index(i, start, tables, layer):
        return (i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(npw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # k_pages (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # v_pages
            pl.BlockSpec((1, Hk, PS, D), kn_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hk, PS, D), kn_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hk, PS, D), k_pages.dtype),
            pltpu.VMEM((Hk, PS, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_prefill_kernel, page_size=PS, T=T),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(start, block_tables.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1), k_pages, v_pages, kn, vn)
