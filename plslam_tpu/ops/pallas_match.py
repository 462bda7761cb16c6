"""Fused projection-gated Hamming top-2 search as a Pallas TPU kernel.

The jnp path (`ops/hamming.py` + mask construction in `models/tracking.py`)
materializes several (N, P) tensors in HBM per search: the int32 distance
matrix, the window/octave/visibility masks, and argmin temporaries — at
N=1024 keypoints x P=8192 map points x 16 streams that is gigabytes of HBM
traffic per frame batch.

This kernel fuses the whole search: descriptor dot products run on the MXU
tile-by-tile, the projection-window / octave / visibility gates are computed
in-register per tile, and only the running (best, second, argmin) per query
survive — O(N) output instead of O(N*P) intermediates.

Numerically identical to the jnp path (exact integer Hamming distances,
same gate semantics); `tests/test_pallas_match.py` checks equivalence.

MEASURED VERDICT (TPU v5e): XLA's fusion of the jnp path runs the full
1024x8192 gated search in ~1.8 ms — the (N, P) intermediates never hit HBM
un-fused — while this hand-scheduled kernel (f32-emulated dots forced by
this Mosaic build's f32-only lowering, sequential un-pipelined D-tiles)
takes ~1000 ms. The jnp path therefore remains the production matcher:
hand-scheduling lost to the compiler here, which is itself a result the
framework records (don't hand-schedule what XLA already fuses). The kernel
stays as an exactness-tested reference for future Mosaic builds with int8
MXU support + double-buffered DMA, where the balance may flip at larger
map/batch sizes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 1 << 20

Q_TILE = 128   # queries per grid step
D_TILE = 512   # database points per inner loop step


def _kernel(q_pm_ref, q_uv_ref, q_oct_ref, q_valid_ref,
            d_pm_ref, d_uv_ref, d_rad_ref, d_lvl_ref, d_vis_ref,
            best_ref, second_ref, idx_ref):
    """One grid step: Q_TILE queries against the whole database.

    All compute is float32 (this TPU's Mosaic only lowers f32): the +-1
    descriptor dot <= 256 and the Hamming distance <= 256 are exactly
    representable, so the result is still exact integer Hamming."""
    P = d_pm_ref.shape[0]
    n_tiles = P // D_TILE
    FINV = jnp.float32(INVALID)

    q_pm = q_pm_ref[:]                       # (Q, 256) f32 (+-1)
    q_u = q_uv_ref[:, 0:1]                   # (Q, 1)
    q_v = q_uv_ref[:, 1:2]
    q_oct = q_oct_ref[:, 0:1]                # (Q, 1) f32
    q_ok = q_valid_ref[:, 0:1]               # (Q, 1) f32 (0/1)

    def body(t, carry):
        best, second, idx = carry
        sl = pl.ds(t * D_TILE, D_TILE)
        d_pm = d_pm_ref[sl, :]               # (D, 256) f32
        dot = jax.lax.dot_general(
            q_pm, d_pm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (Q, D)
        dist = (256.0 - dot) * 0.5

        d_u = d_uv_ref[sl, 0]                # (D,)
        d_v = d_uv_ref[sl, 1]
        rad = d_rad_ref[sl, 0]
        lvl = d_lvl_ref[sl, 0]
        vis = d_vis_ref[sl, 0]

        in_win = ((jnp.abs(q_u - d_u[None, :]) < rad[None, :])
                  & (jnp.abs(q_v - d_v[None, :]) < rad[None, :]))
        oct_ok = jnp.abs(q_oct - lvl[None, :]) <= 1.001
        ok = in_win & oct_ok & (vis[None, :] > 0) & (q_ok > 0)
        dist = jnp.where(ok, dist, FINV)

        tile_best = jnp.min(dist, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1).astype(
            jnp.float32) + (t * D_TILE).astype(jnp.float32)
        tile_arg = jnp.min(
            jnp.where(dist == tile_best[:, None], col, jnp.float32(P)), axis=1)
        dist2 = jnp.where(col == tile_arg[:, None], FINV, dist)
        tile_second = jnp.min(dist2, axis=1)

        new_best = jnp.minimum(best, tile_best)
        new_idx = jnp.where(tile_best < best, tile_arg, idx)
        new_second = jnp.minimum(jnp.maximum(best, tile_best),
                                 jnp.minimum(second, tile_second))
        return new_best, new_second, new_idx

    init = (jnp.full((Q_TILE,), FINV, jnp.float32),
            jnp.full((Q_TILE,), FINV, jnp.float32),
            jnp.zeros((Q_TILE,), jnp.float32))
    best, second, idx = jax.lax.fori_loop(0, n_tiles, body, init)
    best_ref[:, 0] = best
    second_ref[:, 0] = second
    idx_ref[:, 0] = idx


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=())
def gated_hamming_best2(q_bits, q_uv, q_oct, q_valid,
                        d_bits, d_uv, d_radius, d_level, d_visible):
    """Projection-gated Hamming NN search.

    q_bits: (N, 256) {0,1}; d_bits: (P, 256) {0,1}; d_uv: projected map
    point pixels; d_radius: per-point window radius; d_level: predicted
    octave; d_visible: frustum mask. Returns (best_idx, best, second) as in
    `hamming.masked_best2` under the tracking gates.
    """
    N = q_bits.shape[0]
    P = d_bits.shape[0]
    Np = -(-N // Q_TILE) * Q_TILE
    Pp = -(-P // D_TILE) * D_TILE

    f32 = jnp.float32
    q_pm = _pad_to((q_bits.astype(f32) * 2 - 1), Np)
    q_uv_p = _pad_to(q_uv.astype(f32), Np)
    q_oct_p = _pad_to(q_oct.astype(f32), Np)[:, None]
    q_val_p = _pad_to(q_valid.astype(f32), Np)[:, None]
    d_pm = _pad_to((d_bits.astype(f32) * 2 - 1), Pp)
    d_uv_p = _pad_to(d_uv.astype(f32), Pp)
    d_rad_p = _pad_to(d_radius.astype(f32), Pp)[:, None]
    d_lvl_p = _pad_to(d_level.astype(f32), Pp)[:, None]
    d_vis_p = _pad_to(d_visible.astype(f32), Pp)[:, None]

    grid = (Np // Q_TILE,)
    out_shape = [jax.ShapeDtypeStruct((Np, 1), jnp.float32)] * 3
    qspec = lambda w: pl.BlockSpec((Q_TILE, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    dspec = lambda w: pl.BlockSpec((Pp, w), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[qspec(256), qspec(2), qspec(1), qspec(1),
                  dspec(256), dspec(2), dspec(1), dspec(1), dspec(1)],
        out_specs=[pl.BlockSpec((Q_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
    )(q_pm, q_uv_p, q_oct_p, q_val_p, d_pm, d_uv_p, d_rad_p, d_lvl_p, d_vis_p)
    return (jnp.clip(idx[:N, 0], 0, P - 1).astype(jnp.int32),
            best[:N, 0].astype(jnp.int32),
            second[:N, 0].astype(jnp.int32))
