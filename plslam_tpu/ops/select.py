"""Spatially-uniform top-N keypoint selection on a fixed grid.

TPU-native replacement for `ORBextractor::DistributeOctTree`
(`src/ORBextractor.cc:539-763`).  The quadtree's goal — spatially uniform
coverage keeping the best-response corner per region — is achieved
data-parallel: per-cell top-k ranking, then a global selection ordered by
(rank-within-cell, -response), so every cell's best corner is chosen before
any cell's second-best.  Output shapes are static; absent features are
flagged invalid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_grid_topk(score, n_out: int, cell: int = 32, k_per_cell: int = 8,
                     order: str = "uniform"):
    """Select up to `n_out` peaks from a dense score map.

    Args:
      score: (H, W) float32, 0 where no corner (already NMS'd / masked).
      n_out: static number of output slots.
      cell: grid cell size in pixels (reference uses ~30px FAST cells).
      k_per_cell: max keypoints drawn from one cell before others fill up.
      order: candidate priority once the per-cell cap is honored.
        "uniform" — (rank-within-cell, -response): every cell's champion
          before any cell's runner-up (the quadtree's spatial-uniformity
          goal, `DistributeOctTree`, src/ORBextractor.cc:539). MEASURED
          30% kp repeatability @1.5px on the photo head-to-head: when the
          budget < #cells the champion cutoff and within-cell rank flips
          reshuffle the selected set between views.
        "response" — -response alone (OpenCV ORB's retainBest ordering),
          spatial spread enforced only by the per-cell cap. MEASURED 70-73%
          repeatability (vs cv2 ORB's 75-80%) at ~2.5x fewer occupied
          cells; more matches/landmark observations, less uniform coverage.

    Returns:
      uv: (n_out, 2) float32 — (x, y) pixel coords (level frame).
      resp: (n_out,) float32 — corner response (0 for invalid slots).
      valid: (n_out,) bool.
    """
    h, w = score.shape
    gy, gx = -(-h // cell), -(-w // cell)
    ph, pw = gy * cell, gx * cell
    s = jnp.pad(score, ((0, ph - h), (0, pw - w)))
    # (gy, cell, gx, cell) -> (gy*gx, cell*cell)
    cells = s.reshape(gy, cell, gx, cell).transpose(0, 2, 1, 3).reshape(gy * gx, cell * cell)

    k = min(k_per_cell, cell * cell)
    # iterative masked argmax instead of lax.top_k: the TopK custom-call was
    # the largest op of extraction after the gather rewrite (sort network on
    # (C, cell^2)); k rounds of argmax + mask are plain VPU reductions
    vals_l, idx_l = [], []
    c = cells
    iota = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    for _ in range(k):
        i = jnp.argmax(c, axis=1)
        vals_l.append(jnp.max(c, axis=1))
        idx_l.append(i)
        c = jnp.where(iota == i[:, None], -jnp.inf, c)
    vals = jnp.stack(vals_l, axis=1)     # (C, k) descending
    idx = jnp.stack(idx_l, axis=1)

    # Global coordinates of each candidate.
    cy = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 0) // gx
    cx = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 0) % gx
    iy = idx // cell
    ix = idx % cell
    ys = cy * cell + iy
    xs = cx * cell + ix

    rank = jax.lax.broadcasted_iota(jnp.int32, (gy * gx, k), 1)
    valid_c = vals > 0.0
    # Priority: smaller is better. Invalid candidates get +inf.
    big = jnp.float32(1e9)
    if order == "response":
        prio = -jnp.minimum(vals, big - 1.0)
    else:
        prio = rank.astype(jnp.float32) * big - jnp.minimum(vals, big - 1.0)
    prio = jnp.where(valid_c, prio, jnp.inf)

    flat_prio = prio.reshape(-1)
    flat_vals = vals.reshape(-1)
    flat_x = xs.reshape(-1)
    flat_y = ys.reshape(-1)

    n_cand = flat_prio.shape[0]
    n_take = min(n_out, n_cand)
    _, take = jax.lax.top_k(-flat_prio, n_take)
    uv = jnp.stack([flat_x[take], flat_y[take]], axis=-1).astype(jnp.float32)
    resp = flat_vals[take]
    valid = jnp.isfinite(flat_prio[take])
    if n_take < n_out:
        pad = n_out - n_take
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    resp = jnp.where(valid, resp, 0.0)
    return uv, resp, valid
