"""Batched page copy inside the paged KV pool (TPU Pallas).

The beam copy-on-write (inference/paged_beam.py) moves each beam slot's
current partial page to its private page on parent reorder. The two XLA
formulations both miss bandwidth: the gather+scatter form lowers to
sequential per-page while loops (~4x the bandwidth floor), and the
one-hot matmul form streams the ENTIRE pool once per step (read+write of
every page to move ~40 of them).

This kernel moves exactly the listed pages in two phases:
  1. an XLA gather stages pool[src] (a bandwidth-rate read of the OLD
     pool — beam reorders form chains where one slot's private page is
     simultaneously another child's source and its own destination, so
     all sources must be read before any destination is written);
  2. a Pallas grid over the moves DMAs each staged page to its dst row,
     with the output ALIASED to the pool, so unmoved pages are untouched
     and no whole-pool copy exists.

dst rows must be distinct (each beam slot's own private page — the page
plan guarantees it); src may repeat.

Reference surface: the dense beam cache's in-place row reorder
(/root/reference/procyon/model/model_unified.py:830-832); page-granular
COW is the TPU paged-serving redesign.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dst_ref, staged_ref, pool_in_ref, pool_out_ref):
    del dst_ref, pool_in_ref  # aliased input is never read in-kernel
    pool_out_ref[...] = staged_ref[...]


def move_pages(pool_arr, src, dst, *, interpret=False):
    """pool_arr [N, page, KD]; src/dst [M] int32 page rows. Returns the
    pool with pool[dst[i]] = old_pool[src[i]] for every move (and every
    other page untouched), without streaming the rest of the pool."""
    n_moves = src.shape[0]
    _, page, kd = pool_arr.shape
    staged = pool_arr[src]                       # [M, page, KD] XLA gather

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_moves,),
            in_specs=[
                pl.BlockSpec((1, page, kd), lambda i, dst: (i, 0, 0)),
                # the aliased pool input must appear as an operand; a
                # constant block index keeps its DMA elided after the
                # first cell (the pipeline skips repeated identical
                # block indices) and never read in-kernel
                pl.BlockSpec((1, page, kd), lambda i, dst: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, page, kd),
                                   lambda i, dst: (dst[i], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(pool_arr.shape, pool_arr.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(dst.astype(jnp.int32), staged, pool_arr)
    return out


def _kernel_direct(src_ref, dst_ref, page_in_ref, pool_out_ref):
    del src_ref, dst_ref
    pool_out_ref[...] = page_in_ref[...]


def move_pages_direct(pool_arr, src, dst, *, interpret=False):
    """In-place pool[dst[i]] = pool[src[i]] WITHOUT the staging pass.

    Correct ONLY when the src and dst sets are disjoint (the beam path's
    ping-pong private pages guarantee it: step t writes phase-t%2 pages
    while every source is a phase-(1-t%2) page). Halves move_pages'
    traffic: each listed page is read once and written once."""
    n_moves = src.shape[0]
    _, page, kd = pool_arr.shape
    return pl.pallas_call(
        _kernel_direct,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_moves,),
            in_specs=[
                pl.BlockSpec((1, page, kd),
                             lambda i, src, dst: (src[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, page, kd),
                                   lambda i, src, dst: (dst[i], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(pool_arr.shape, pool_arr.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(src.astype(jnp.int32), dst.astype(jnp.int32), pool_arr)
