"""Keyframe middle end: insertion, triangulation of new landmarks, local BA,
culling — the LocalMapping stage (`src/LocalMapping.cc`) as pure jitted
state transitions over :class:`MapState`.

Where the reference walks covisible-KF lists and per-match SVDs
(`CreateNewMapPoints`, `src/LocalMapping.cc:329-595`), this module matches
whole keyframes at once (Hamming matmul + epipolar mask), triangulates every
surviving candidate in one batched DLT, and appends to the map with
prefix-sum slot allocation.  Culling (`MapPointCulling :241`) is a masked
update, keyframe surgery never rewires pointers — observations just become
-1 entries.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, triangulation as tri
from ..mapstate import state as mstate
from ..mapstate.state import MapState
from ..ops import hamming
from ..ops.extract import PointFeatures
from ..optim import local_ba

TH_LOW = 50
CHI2_2D = 5.991


def insert_keyframe(cam, ms: MapState, feats: PointFeatures, T, matched_pt,
                    frame_id, scale_factors) -> MapState:
    """Promote the current frame to a keyframe (`CreateNewKeyFrame`,
    `src/Tracking.cc:1666` + `ProcessNewKeyFrame`, `src/LocalMapping.cc:157`):
    write features, bind tracked map points, refresh their statistics."""
    k = ms.n_kf
    P = ms.pt_xyz.shape[0]

    ms = ms._replace(
        kf_T=ms.kf_T.at[k].set(T),
        kf_valid=ms.kf_valid.at[k].set(True),
        kf_frame_id=ms.kf_frame_id.at[k].set(frame_id),
        kf_uv=ms.kf_uv.at[k].set(feats.uv_un),
        kf_octave=ms.kf_octave.at[k].set(feats.octave),
        kf_angle=ms.kf_angle.at[k].set(feats.angle),
        kf_desc=ms.kf_desc.at[k].set(feats.desc),
        kf_kp_valid=ms.kf_kp_valid.at[k].set(feats.valid),
        kf_pt_idx=ms.kf_pt_idx.at[k].set(matched_pt),
        n_kf=ms.n_kf + 1,
    )

    # refresh observation counts + normals + descriptors of bound points
    has = matched_pt >= 0
    pid = jnp.clip(matched_pt, 0, P - 1)
    ms = ms._replace(
        pt_n_obs=ms.pt_n_obs.at[pid].add(has.astype(jnp.int32)))
    # normal: running mean of viewing directions; descriptor: latest obs
    T_wc = se3.se3_inv(T)
    c_w = T_wc[:3, 3]
    dirs = ms.pt_xyz[pid] - c_w
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6)
    n_obs = jnp.maximum(ms.pt_n_obs[pid].astype(jnp.float32), 1.0)[:, None]
    new_normal = ms.pt_normal.at[pid].add(
        jnp.where(has[:, None], (dirs - ms.pt_normal[pid]) / n_obs, 0.0))
    new_desc = ms.pt_desc.at[pid].set(
        jnp.where(has[:, None], feats.desc, ms.pt_desc[pid]))
    return ms._replace(pt_normal=new_normal, pt_desc=new_desc)


def _fundamental_between(cam, T1, T2):
    """F12 such that x2^T F x1 = 0 for pixel coords, cf
    `LocalMapping::ComputeF12` (`src/LocalMapping.cc:1739`)."""
    T21 = T2 @ se3.se3_inv(T1)
    R = T21[:3, :3]
    t = T21[:3, 3]
    E = se3.hat(t) @ R
    Kinv = jnp.linalg.inv(cam.K)
    return Kinv.T @ E @ Kinv


def create_new_points(cam, ms: MapState, k_new, k_ref, sigma2_levels,
                      scale_factors, nn_ratio: float = 0.6) -> MapState:
    """Triangulate new map points between two keyframes
    (`CreateNewMapPoints`, `src/LocalMapping.cc:329`): epipolar-gated
    Hamming matching of yet-unmatched keypoints, batched DLT, then the
    reference's acceptance gates (cheirality, parallax, reprojection,
    scale consistency), appended with prefix-sum slots."""
    P = ms.pt_xyz.shape[0]
    N = ms.kf_uv.shape[1]
    T1 = ms.kf_T[k_new]
    T2 = ms.kf_T[k_ref]
    uv1 = ms.kf_uv[k_new]
    uv2 = ms.kf_uv[k_ref]

    free1 = ms.kf_kp_valid[k_new] & (ms.kf_pt_idx[k_new] < 0)
    free2 = ms.kf_kp_valid[k_ref] & (ms.kf_pt_idx[k_ref] < 0)

    D = hamming.distance_matrix(ms.kf_desc[k_new], ms.kf_desc[k_ref])
    # epipolar gate: distance of kp2 to the epipolar line of kp1
    F12 = _fundamental_between(cam, T1, T2)
    p1 = jnp.concatenate([uv1, jnp.ones((N, 1))], axis=-1)
    l2 = p1 @ F12.T  # (N,3) lines in image 2
    p2 = jnp.concatenate([uv2, jnp.ones((N, 1))], axis=-1)
    num = jnp.abs(l2 @ p2.T)  # (N1, N2)
    den = jnp.sqrt(jnp.maximum(l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2, 1e-12))
    epi_d2 = (num / den) ** 2
    epi_ok = epi_d2 < 3.84 * sigma2_levels[ms.kf_octave[k_ref]][None, :]

    mask = free1[:, None] & free2[None, :] & epi_ok
    idx2, best, second = hamming.masked_best2(D, mask)
    ok = (best <= TH_LOW) & (
        best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    # mutual best (dedup: one kp2 per kp1)
    Dm = jnp.where(mask, D, hamming.INVALID)
    rev = jnp.argmin(Dm, axis=0)
    ok = ok & (rev[idx2] == jnp.arange(N))

    # --- batched triangulation + gates ---
    P1 = tri.projection_matrix(cam, T1)
    P2 = tri.projection_matrix(cam, T2)
    uv2m = uv2[idx2]
    X = tri.triangulate_dlt(P1, P2, uv1, uv2m)
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    Xc1 = se3.transform(T1, X)
    Xc2 = se3.transform(T2, X)
    z1, z2 = Xc1[:, 2], Xc2[:, 2]

    def reproj2(Xc, uv, s2):
        q = jnp.stack([cam.fx * Xc[:, 0] / jnp.maximum(Xc[:, 2], 1e-6) + cam.cx,
                       cam.fy * Xc[:, 1] / jnp.maximum(Xc[:, 2], 1e-6) + cam.cy], -1)
        return jnp.sum((q - uv) ** 2, axis=-1) / s2

    e1 = reproj2(Xc1, uv1, sigma2_levels[ms.kf_octave[k_new]])
    e2 = reproj2(Xc2, uv2m, sigma2_levels[ms.kf_octave[k_ref]][idx2])

    c1 = se3.se3_inv(T1)[:3, 3]
    c2 = se3.se3_inv(T2)[:3, 3]
    cosp = tri.parallax_cos(c1, c2, X)

    # scale-consistency: distance ratio vs octave ratio (src/LocalMapping.cc:536-556)
    d1 = jnp.linalg.norm(X - c1, axis=-1)
    d2 = jnp.linalg.norm(X - c2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-6)
    ratio_oct = (scale_factors[ms.kf_octave[k_new]]
                 / scale_factors[ms.kf_octave[k_ref]][idx2])
    ratio_factor = 1.5 * 1.2
    scale_ok = (ratio_dist * ratio_factor > ratio_oct) & (
        ratio_dist < ratio_oct * ratio_factor)

    create = (ok & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.9998)
              & (e1 < CHI2_2D) & (e2 < CHI2_2D) & scale_ok)

    slots, accepted, n_pt_new = mstate.append_slots(ms.n_pt, create, P)

    # landmark attributes (scale-invariance range from octave, cf
    # MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:341)
    oct1 = ms.kf_octave[k_new]
    level_scale = scale_factors[oct1]
    max_dist = d1 * level_scale
    n_levels = scale_factors.shape[0]
    min_dist = max_dist / scale_factors[n_levels - 1]
    normal = (X - c1) / jnp.maximum(jnp.linalg.norm(X - c1, axis=-1, keepdims=True), 1e-6)

    a = accepted
    ms = ms._replace(
        pt_xyz=ms.pt_xyz.at[slots].set(jnp.where(a[:, None], X, ms.pt_xyz[slots])),
        pt_desc=ms.pt_desc.at[slots].set(jnp.where(a[:, None], ms.kf_desc[k_new], ms.pt_desc[slots])),
        pt_normal=ms.pt_normal.at[slots].set(jnp.where(a[:, None], normal, ms.pt_normal[slots])),
        pt_min_dist=ms.pt_min_dist.at[slots].set(jnp.where(a, min_dist, ms.pt_min_dist[slots])),
        pt_max_dist=ms.pt_max_dist.at[slots].set(jnp.where(a, max_dist, ms.pt_max_dist[slots])),
        pt_valid=ms.pt_valid.at[slots].set(jnp.where(a, True, ms.pt_valid[slots])),
        pt_first_kf=ms.pt_first_kf.at[slots].set(jnp.where(a, k_new, ms.pt_first_kf[slots])),
        pt_n_obs=ms.pt_n_obs.at[slots].set(jnp.where(a, 2, ms.pt_n_obs[slots])),
        pt_visible=ms.pt_visible.at[slots].set(jnp.where(a, 1, ms.pt_visible[slots])),
        pt_found=ms.pt_found.at[slots].set(jnp.where(a, 1, ms.pt_found[slots])),
        n_pt=n_pt_new,
    )
    # bind observations in both keyframes
    pid = jnp.where(a, slots.astype(jnp.int32), -1)
    row_new = jnp.where(a, pid, ms.kf_pt_idx[k_new])
    ms = ms._replace(kf_pt_idx=ms.kf_pt_idx.at[k_new].set(row_new))
    row_ref = ms.kf_pt_idx[k_ref].at[idx2].set(
        jnp.where(a, pid, ms.kf_pt_idx[k_ref][idx2]))
    ms = ms._replace(kf_pt_idx=ms.kf_pt_idx.at[k_ref].set(row_ref))
    return ms


def run_local_ba(cam, ms: MapState, sigma2_levels, window: int = 8,
                 p_ba: int = 4096) -> MapState:
    """Local BA over the last `window` keyframes (`LocalBundleAdjustmentWithLine`
    minus lines for now): oldest window slot fixed as gauge, points observed
    by the window selected up to `p_ba` slots, outlier observations erased."""
    K_all = ms.kf_T.shape[0]
    P = ms.pt_xyz.shape[0]
    N = ms.kf_uv.shape[1]
    W = window

    k_new = ms.n_kf - 1
    ids = k_new - W + 1 + jnp.arange(W)         # (W,) global kf ids
    kf_ok = (ids >= 0) & (ids < K_all)
    ids_c = jnp.clip(ids, 0, K_all - 1)
    kf_mask = kf_ok & ms.kf_valid[ids_c]
    first_valid = jnp.argmax(kf_mask)            # oldest valid in window
    kf_fixed = (jnp.arange(W) == first_valid)

    # --- select points observed by the window ---
    win_pt_idx = ms.kf_pt_idx[ids_c]             # (W, N)
    win_obs = (win_pt_idx >= 0) & kf_mask[:, None]
    pid_safe = jnp.clip(win_pt_idx, 0, P - 1)
    observed = jnp.zeros((P,), bool)
    observed = observed.at[pid_safe.reshape(-1)].max(win_obs.reshape(-1))
    observed = observed & ms.pt_valid
    # cap to p_ba (prefer recent points: higher index wins)
    scores = jnp.where(observed, jnp.arange(P, dtype=jnp.int32), -1)
    _, sel = jax.lax.top_k(scores, p_ba)         # (p_ba,) global pt ids
    sel_ok = observed[sel]
    lookup = jnp.full((P,), -1, jnp.int32).at[sel].set(
        jnp.where(sel_ok, jnp.arange(p_ba, dtype=jnp.int32), -1))

    # --- dense observation grids (W, p_ba) ---
    slot = jnp.where(win_obs, lookup[pid_safe], -1)   # (W, N) BA slot or -1
    has = slot >= 0
    slot_safe = jnp.clip(slot, 0, p_ba - 1)
    obs_uv = jnp.zeros((W, p_ba, 2))
    obs_uv = jax.vmap(lambda o, s, u, h: o.at[s].set(
        jnp.where(h[:, None], u, o[s])))(obs_uv, slot_safe, ms.kf_uv[ids_c], has)
    obs_s2 = jnp.ones((W, p_ba))
    s2_rows = sigma2_levels[ms.kf_octave[ids_c]]
    obs_s2 = jax.vmap(lambda o, s, v, h: o.at[s].set(
        jnp.where(h, v, o[s])))(obs_s2, slot_safe, s2_rows, has)
    obs_mask = jnp.zeros((W, p_ba), bool)
    obs_mask = jax.vmap(lambda o, s, h: o.at[s].max(h))(obs_mask, slot_safe, has)

    eln = local_ba.BAProblem.empty_lines(W)
    prob = local_ba.BAProblem(
        kf_T=ms.kf_T[ids_c],
        kf_fixed=kf_fixed | ~kf_mask,
        kf_mask=kf_mask,
        pt_xyz=ms.pt_xyz[sel],
        pt_mask=sel_ok,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        obs_sigma2=obs_s2,
        **eln,
    )
    res = local_ba.bundle_adjust(prob, cam)

    # --- write back poses + points ---
    new_kf_T = ms.kf_T.at[ids_c].set(
        jnp.where(kf_mask[:, None, None], res.kf_T, ms.kf_T[ids_c]))
    new_pt = ms.pt_xyz.at[sel].set(
        jnp.where(sel_ok[:, None], res.pt_xyz, ms.pt_xyz[sel]))

    # --- erase outlier observations (src/Optimizer.cc:2044-2067) ---
    obs_bad = obs_mask & ~res.obs_inlier          # (W, p_ba)
    bad_here = has & jax.vmap(lambda b, s: b[s])(obs_bad, slot_safe)  # (W, N)
    new_rows = jnp.where(bad_here, -1, win_pt_idx)
    new_kf_pt_idx = ms.kf_pt_idx.at[ids_c].set(
        jnp.where(kf_mask[:, None], new_rows, ms.kf_pt_idx[ids_c]))

    ms = ms._replace(kf_T=new_kf_T, pt_xyz=new_pt, kf_pt_idx=new_kf_pt_idx)
    # refresh n_obs for selected points from global incidence
    inc = mstate.observers_of_points(ms)
    return ms._replace(pt_n_obs=jnp.sum(inc, axis=0).astype(jnp.int32))


def cull_points(ms: MapState, k_now) -> MapState:
    """`MapPointCulling` (`src/LocalMapping.cc:241`): during a 3-keyframe
    probation window, drop points with found-ratio < 0.25 or too few
    observations; erase their keyframe bindings."""
    age = k_now - ms.pt_first_kf
    found_ratio = ms.pt_found.astype(jnp.float32) / jnp.maximum(
        ms.pt_visible.astype(jnp.float32), 1.0)
    probation = age < 3
    bad = ms.pt_valid & probation & (
        (found_ratio < 0.25) | ((age >= 2) & (ms.pt_n_obs <= 2)))
    pt_valid = ms.pt_valid & ~bad

    P = ms.pt_xyz.shape[0]
    safe = jnp.clip(ms.kf_pt_idx, 0, P - 1)
    kf_pt_idx = jnp.where((ms.kf_pt_idx >= 0) & bad[safe], -1, ms.kf_pt_idx)
    return ms._replace(pt_valid=pt_valid, kf_pt_idx=kf_pt_idx)
