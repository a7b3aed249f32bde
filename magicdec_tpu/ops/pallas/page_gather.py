"""Page gather: copy selected cache pages via scalar-prefetched DMA.

TPU-native replacement for the reference's CUDA gather kernels
(gather_copy.cu: gather_copy_vectors / gather_copy_and_concat). XLA's gather
on TPU runs far below DMA speed even for 128KB block slices (~60 GB/s
measured, and XLA may re-execute a gather fused into several consumers);
this kernel instead lets the grid's BlockSpec index_map READ the prefetched
page-index array, so each grid cell's input block IS the selected page —
pure pipelined DMA, no gather op at all.

Used by the Quest drafting engine to fetch its top-scored pages; any
block-granular gather (page tables, cluster blocks with block-aligned
members) can reuse it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(l_ref, pages_ref, k_ref, v_ref, ok_ref, ov_ref):
    del l_ref, pages_ref
    ok_ref[0, 0] = k_ref[0, 0]
    ov_ref[0, 0] = v_ref[0, 0]


def _dma_kernel(l_ref, pages_ref, k_hbm, v_hbm, ok_hbm, ov_hbm, sems,
                *, page: int, wave: int):
    """Single grid cell: issue direct HBM->HBM block copies for every
    (b, j) selection, `wave` DMAs in flight at a time (per tensor). Grid-cell
    overhead made the BlockSpec variant slow when blocks are small and many
    (retro/squeeze cluster blocks); here the DMA engines run the whole
    gather with one cell of control."""
    B, n = pages_ref.shape
    l = l_ref[0]
    total = B * n

    def dma_pair(i, slot):
        b = i // n
        j = i - b * n
        p = pages_ref[b, j]
        kd = pltpu.make_async_copy(
            k_hbm.at[l, b, pl.ds(p * page, page), :],
            ok_hbm.at[b, j], sems.at[slot, 0])
        vd = pltpu.make_async_copy(
            v_hbm.at[l, b, pl.ds(p * page, page), :],
            ov_hbm.at[b, j], sems.at[slot, 1])
        return kd, vd

    n_waves = pl.cdiv(total, wave)

    def wave_body(w, _):
        def start_one(s, _):
            i = w * wave + s
            @pl.when(i < total)
            def _():
                kd, vd = dma_pair(i, s)
                kd.start()
                vd.start()
            return 0
        jax.lax.fori_loop(0, wave, start_one, 0)

        def wait_one(s, _):
            i = w * wave + s
            @pl.when(i < total)
            def _():
                kd, vd = dma_pair(i, s)
                kd.wait()
                vd.wait()
            return 0
        jax.lax.fori_loop(0, wave, wait_one, 0)
        return 0

    jax.lax.fori_loop(0, n_waves, wave_body, 0)


def _kernel_single(l_ref, pages_ref, s_ref, o_ref):
    del l_ref, pages_ref
    o_ref[0, 0] = s_ref[0, 0]


def _dma_kernel_single(l_ref, pages_ref, s_hbm, o_hbm, sems,
                       *, page: int, wave: int):
    B, n = pages_ref.shape
    l = l_ref[0]
    total = B * n

    def dma(i, slot):
        b = i // n
        j = i - b * n
        p = pages_ref[b, j]
        return pltpu.make_async_copy(
            s_hbm.at[l, b, pl.ds(p * page, page), :],
            o_hbm.at[b, j], sems.at[slot])

    n_waves = pl.cdiv(total, wave)

    def wave_body(w, _):
        def start_one(s, _):
            i = w * wave + s
            @pl.when(i < total)
            def _():
                dma(i, s).start()
            return 0
        jax.lax.fori_loop(0, wave, start_one, 0)

        def wait_one(s, _):
            i = w * wave + s
            @pl.when(i < total)
            def _():
                dma(i, s).wait()
            return 0
        jax.lax.fori_loop(0, wave, wait_one, 0)
        return 0

    jax.lax.fori_loop(0, n_waves, wave_body, 0)


@functools.partial(jax.jit, static_argnames=("page", "interpret", "mode"))
def page_gather_single(store: jax.Array, layer, pages, *, page: int,
                       interpret: bool = False, mode: str = "auto"):
    """One-array variant of page_gather: store [L, B, R, HD] (R a multiple
    of `page`), pages [B, n] -> [B, n, page, HD].

    Exists for KV-FUSED stores (a cluster's K rows followed by its V rows,
    page = 2*cap): one DMA descriptor then moves both — the descriptor issue
    cost, not bytes, bounds this gather (~1.7us/descriptor measured on v5e),
    so halving the descriptor count halves the gather time. Counterpart of
    the reference's gather_copy_and_concat (gather_copy.cu).
    """
    L, B, R, HD = store.shape
    n = pages.shape[1]
    if mode == "auto":
        mode = "grid" if page * HD * store.dtype.itemsize >= 64 * 1024 \
            else "dma"
    if mode == "dma" and not interpret:
        out = pl.pallas_call(
            functools.partial(_dma_kernel_single, page=page, wave=16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
            ),
            out_shape=jax.ShapeDtypeStruct((B, n, page, HD), store.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(layer, jnp.int32).reshape(1),
          jnp.asarray(pages, jnp.int32), store)
        return out

    def idx(b, j, l_ref, p_ref):
        return (l_ref[0], b, p_ref[b, j], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n),
        in_specs=[pl.BlockSpec((1, 1, page, HD), idx,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, page, HD),
                               lambda b, j, l_ref, p_ref: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel_single,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, page, HD), store.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(pages, jnp.int32), store)


def page_gather_single_sharded(store, layer, pages, *, page: int, mesh=None,
                               interpret: bool = False):
    """page_gather_single under a (dp, tp) mesh (see page_gather_sharded)."""
    if mesh is None or mesh.devices.size == 1:
        return page_gather_single(store, layer, pages, page=page,
                                  interpret=interpret)
    from jax.sharding import PartitionSpec as P
    fn = jax.shard_map(
        functools.partial(page_gather_single, page=page, interpret=interpret),
        mesh=mesh,
        in_specs=(P(None, "dp", None, "tp"), P(), P("dp", None)),
        out_specs=P("dp", None, None, "tp"), check_vma=False)
    return fn(store, layer, pages)


def page_gather_sharded(k_cache, v_cache, layer, pages, *, page: int,
                        mesh=None, interpret: bool = False):
    """page_gather under a (dp, tp) mesh: batch rows shard over dp, packed
    head columns over tp — each shard gathers its own blocks, no collectives.
    Falls through to the plain kernel off-mesh."""
    if mesh is None or mesh.devices.size == 1:
        return page_gather(k_cache, v_cache, layer, pages, page=page,
                           interpret=interpret)
    from jax.sharding import PartitionSpec as P
    fn = jax.shard_map(
        functools.partial(page_gather, page=page, interpret=interpret),
        mesh=mesh,
        in_specs=(P(None, "dp", None, "tp"), P(None, "dp", None, "tp"),
                  P(), P("dp", None)),
        out_specs=(P("dp", None, None, "tp"), P("dp", None, None, "tp")),
        check_vma=False)
    return fn(k_cache, v_cache, layer, pages)


@functools.partial(jax.jit, static_argnames=("page", "interpret", "mode"))
def page_gather(k_cache: jax.Array, v_cache: jax.Array, layer, pages,
                *, page: int = 128, interpret: bool = False,
                mode: str = "auto"):
    """k_cache/v_cache [L, B, S, HD] (S a multiple of `page`), layer a traced
    int32 scalar, pages [B, n] int32 page indices. Returns
    (k_sel, v_sel) [B, n, page, HD] in the cache dtype.

    mode: "grid" = one grid cell per block (BlockSpec index_map gather, best
    for few large blocks); "dma" = single cell issuing direct HBM->HBM block
    copies (best for many small blocks); "auto" picks by block size.
    """
    L, B, S, HD = k_cache.shape
    n = pages.shape[1]
    if mode == "auto":
        mode = "grid" if page * HD * k_cache.dtype.itemsize >= 64 * 1024 \
            else "dma"
    if mode == "dma" and not interpret:
        sems = pltpu.SemaphoreType.DMA((16, 2))
        out = pl.pallas_call(
            functools.partial(_dma_kernel, page=page, wave=16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                           pl.BlockSpec(memory_space=pltpu.ANY)),
                scratch_shapes=[sems],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, n, page, HD), k_cache.dtype),
                jax.ShapeDtypeStruct((B, n, page, HD), v_cache.dtype),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.asarray(layer, jnp.int32).reshape(1),
          jnp.asarray(pages, jnp.int32), k_cache, v_cache)
        return out

    def idx(b, j, l_ref, p_ref):
        return (l_ref[0], b, p_ref[b, j], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((1, 1, page, HD), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, HD), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, page, HD), lambda b, j, l_ref, p_ref: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, HD), lambda b, j, l_ref, p_ref: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, n, page, HD), k_cache.dtype),
            jax.ShapeDtypeStruct((B, n, page, HD), v_cache.dtype),
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(pages, jnp.int32), k_cache, v_cache)
