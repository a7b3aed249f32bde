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


@functools.partial(jax.jit, static_argnames=("page", "interpret"))
def page_gather(k_cache: jax.Array, v_cache: jax.Array, layer, pages,
                *, page: int = 128, interpret: bool = False):
    """k_cache/v_cache [L, B, S, HD] (S a multiple of `page`), layer a traced
    int32 scalar, pages [B, n] int32 page indices. Returns
    (k_sel, v_sel) [B, n, page, HD] in the cache dtype."""
    L, B, S, HD = k_cache.shape
    n = pages.shape[1]

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
