"""Per-frame tracking as one jitted XLA program.

TPU-native counterpart of the reference front end (`src/Tracking.cc`):
`TrackWithMotionModel` + `TrackLocalMapWithLines` collapse into a single
device program — instead of walking per-cell grid buckets
(`Frame::GetFeaturesInArea`, `src/Frame.cc:713`) the matcher computes the
FULL keypoint x map-point Hamming matrix on the MXU and applies the frustum
/ window / scale gates as masks (`ORBmatcher::SearchByProjection`
semantics, `src/ORBmatcher.cc:56-152`), then runs the staged-LM pose
optimization.  The search-then-optimize-twice structure of the reference is
replaced by one wider search + one optimization, which subsumes it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..mapstate.state import MapState
from ..ops import hamming
from ..ops.extract import PointFeatures
from ..optim import pose_opt

TH_HIGH = 100  # src/ORBmatcher.cc:38
TH_LOW = 50


class TrackResult(NamedTuple):
    T: jnp.ndarray            # (4,4) optimized pose
    matched_pt: jnp.ndarray   # (N,) i32 map-point id per keypoint (-1)
    inlier: jnp.ndarray       # (N,) bool
    n_inliers: jnp.ndarray    # () i32
    n_visible: jnp.ndarray    # () i32
    visible_pts: jnp.ndarray  # (P,) bool (for found/visible statistics)
    matched_ln: jnp.ndarray   # (M,) i32 map-line id per line feature (-1)
    ln_inlier: jnp.ndarray    # (M,) bool
    n_ln_inliers: jnp.ndarray  # () i32
    visible_lns: jnp.ndarray  # (L,) bool
    scalars: jnp.ndarray      # (6,) i32 [n_inliers, n_ln_inliers, n_matched,
                              # ref_kf_tracked3, n_pt, n_ln] — one packed
                              # readback/frame (occupancy counters piggyback
                              # so capacity-growth checks cost no extra sync)
    velocity: jnp.ndarray     # (4,4) damped constant-velocity estimate
    T_rel: jnp.ndarray        # (4,4) pose relative to the reference (latest)
                              # keyframe: T ∘ T_kf^-1 — the reference logs
                              # trajectories this way and re-anchors on save
                              # (src/Tracking.cc:580-595, System.cc:363-392)


def predict_scale(dist, max_dist, scale: float, n_levels: int):
    """`MapPoint::PredictScale` (`src/MapPoint.cc:396`): expected octave from
    the ratio of the max scale-invariance distance to the current distance."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1e-6)
    level = jnp.ceil(jnp.log(ratio) / jnp.log(scale))
    return jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)


def local_map_mask(ms: MapState, window: int = 12, anchor_kf=None):
    """Points observed by the `window` keyframes most covisible with the
    ANCHOR keyframe — the reference's local map (`UpdateLocalKeyFrames/
    Points`, `src/Tracking.cc:1899-2081`: keyframes sharing observations
    with the current frame, capped at 80).  The anchor defaults to the
    latest keyframe (the tracking reference KF under sequential motion);
    after a relocalization it is the keyframe the inliers landed in, so a
    kidnap into an OLD map region tracks against that region's landmarks
    instead of the recent window (which would immediately lose tracking
    again).  Recency breaks covisibility ties, so a young map degrades to
    the sequential window.
    Tracking must NOT match against the whole map: descriptor-only
    re-association with long-lost landmarks would silently close loops
    through data association, masking drift instead of exposing it to the
    explicit loop-closing stage."""
    K, N = ms.kf_pt_idx.shape
    P = ms.pt_xyz.shape[0]
    ids = jnp.arange(K)
    if anchor_kf is None:
        anchor = jnp.maximum(ms.n_kf - 1, 0)
    else:
        anchor = jnp.where(anchor_kf >= 0, anchor_kf,
                           jnp.maximum(ms.n_kf - 1, 0))
    valid = ms.kf_valid & (ids < ms.n_kf)
    # covisibility weight of every keyframe with the anchor = shared bound
    # map points: one bitmap scatter + one (K, N) gather (no K x K matmul)
    arow = ms.kf_pt_idx[anchor]
    abit = jnp.zeros((P,), bool).at[jnp.clip(arow, 0, P - 1)].max(arow >= 0)
    shared = abit[jnp.clip(ms.kf_pt_idx, 0, P - 1)] & (ms.kf_pt_idx >= 0)
    w = jnp.sum(shared.astype(jnp.int32), axis=1)                   # (K,)
    # rank: covisible weight, recency as tie-break; anchor always first;
    # non-covisible keyframes excluded (score <= 0)
    score = jnp.where(valid & (w > 0), w * K + ids, 0)
    score = jnp.where(ids == anchor, jnp.int32(jnp.iinfo(jnp.int32).max),
                      score)
    top_s, top_i = jax.lax.top_k(score, min(window, K))
    sel = jnp.zeros((K,), bool).at[top_i].max(top_s > 0)
    rows = jnp.where((sel & valid)[:, None], ms.kf_pt_idx, -1)
    mask = jnp.zeros((P,), bool).at[
        jnp.clip(rows, 0, P - 1).reshape(-1)].max((rows >= 0).reshape(-1))
    # keyframe-less maps (loaded point clouds, pure-localization setups):
    # everything is local
    return jnp.where(ms.n_kf > 0, mask, True)


def _match_against_map(cam, ms: MapState, feats: PointFeatures, D, T,
                       scale_factors, radius_scale, wide: bool,
                       n_levels: int, scale: float, pt_mask=None,
                       backend: str = "xla"):
    """Projection-window search of frame keypoints against the map under
    pose T. `wide=True` = motion-model-style radius (flat 15px x octave
    scale, `src/Tracking.cc:1338`); `wide=False` = local-map radii
    (2.5/4.0 by viewing angle, `src/ORBmatcher.cc:146`).

    `backend`: "xla" (default) lets XLA fuse the (N, P) distance matrix +
    gate masks (measured ~1.8 ms for 1024x8192 on v5e); "pallas" routes
    through the fused `ops/pallas_match.gated_hamming_best2` kernel
    (exactness-tested equivalent; see its module docstring for the
    measured comparison on this Mosaic build)."""
    Xc = se3.transform(T, ms.pt_xyz)
    z = Xc[:, 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    u = cam.fx * Xc[:, 0] * iz + cam.cx
    v = cam.fy * Xc[:, 1] * iz + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)

    T_wc = se3.se3_inv(T)
    cam_center = T_wc[:3, 3]
    po = ms.pt_xyz - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    in_range = (dist >= 0.8 * ms.pt_min_dist) & (dist <= 1.2 * ms.pt_max_dist)
    view_cos = jnp.sum(po * ms.pt_normal, axis=-1) / jnp.maximum(dist, 1e-6)
    visible = ms.pt_valid & (z > 0) & in_img & in_range & (view_cos > 0.5)
    if pt_mask is not None:
        visible = visible & pt_mask

    pred_level = predict_scale(dist, ms.pt_max_dist, scale, n_levels)
    if wide:
        r_base = jnp.full_like(dist, 15.0)
    else:
        r_base = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = radius_scale * r_base * scale_factors[pred_level]  # (P,)

    if backend == "pallas":
        from plslam_tpu.ops import pallas_match
        best_idx, best, second = pallas_match.gated_hamming_best2(
            feats.desc, feats.uv_un, feats.octave, feats.valid,
            ms.pt_desc, jnp.stack([u, v], axis=-1), radius, pred_level,
            visible)
    else:
        du = jnp.abs(feats.uv_un[:, 0:1] - u[None, :])  # (N, P)
        dv = jnp.abs(feats.uv_un[:, 1:2] - v[None, :])
        window = (du < radius[None, :]) & (dv < radius[None, :])
        oct_ok = jnp.abs(feats.octave[:, None] - pred_level[None, :]) <= 1
        mask = window & oct_ok & visible[None, :] & feats.valid[:, None]
        best_idx, best, second = hamming.masked_best2(D, mask)
    matched = best <= TH_HIGH
    # injectivity over map points (reference SearchByProjection semantics:
    # one keypoint per landmark per frame; see hamming.dedup_by_target)
    matched = hamming.dedup_by_target(best_idx, matched, best,
                                      ms.pt_xyz.shape[0])
    return best_idx, matched, visible


def _match_lines_against_map(cam, ms: MapState, lfeats, T,
                             radius: float = 10.0, angle_tol: float = 0.29,
                             max_dist: int = 80):
    """Project map lines and match frame line features — the
    `LSDmatcher::SearchByProjection` local-map path (`src/LSDmatcher.cpp:
    221-338`): angle agreement (cos >= 0.96), midpoint window, length-ratio
    gate, Hamming <= TH_HIGH(80)."""
    A = ms.ln_xyz[:, 0]
    B = ms.ln_xyz[:, 1]
    Ac = se3.transform(T, A)
    Bc = se3.transform(T, B)
    za, zb = Ac[:, 2], Bc[:, 2]

    def proj(Xc):
        iz = 1.0 / jnp.maximum(Xc[:, 2], 1e-6)
        return jnp.stack([cam.fx * Xc[:, 0] * iz + cam.cx,
                          cam.fy * Xc[:, 1] * iz + cam.cy], -1)

    ua = proj(Ac)
    ub = proj(Bc)
    mid = 0.5 * (ua + ub)
    in_img = ((mid[:, 0] >= 0) & (mid[:, 0] < cam.width)
              & (mid[:, 1] >= 0) & (mid[:, 1] < cam.height))
    visible = ms.ln_valid & (za > 0) & (zb > 0) & in_img

    # Viewing-direction gate — the `MapLine::UpdateAverageDir` frustum
    # check (`src/MapLine.cpp:334`, used by Frame::isInFrustum for lines,
    # `src/Frame.cc:625`). The average observation direction is DERIVED
    # from the current keyframe bindings each call (one (K, M) scatter)
    # instead of being stored: a stored normal goes stale the moment loop
    # correction or GBA moves the keyframes, and this program already
    # holds the bindings.
    L = ms.ln_valid.shape[0]
    kf_R = ms.kf_T[:, :3, :3]
    kf_centers = -jnp.einsum("kji,kj->ki", kf_R, ms.kf_T[:, :3, 3])  # (K,3)
    lid = jnp.clip(ms.kf_ln_idx, 0, L - 1)                    # (K, M)
    has = (ms.kf_ln_idx >= 0) & ms.kf_valid[:, None]
    cnt = jnp.zeros((L,)).at[lid.reshape(-1)].add(
        has.reshape(-1).astype(jnp.float32))
    csum = jnp.zeros((L, 3)).at[lid.reshape(-1)].add(
        jnp.where(has[..., None], jnp.broadcast_to(
            kf_centers[:, None, :], has.shape + (3,)), 0.0).reshape(-1, 3))
    mean_c = csum / jnp.maximum(cnt, 1.0)[:, None]
    mid3 = 0.5 * (A + B)
    avg_dir = mid3 - mean_c
    avg_dir = avg_dir / jnp.maximum(
        jnp.linalg.norm(avg_dir, axis=-1, keepdims=True), 1e-9)
    T_wc = se3.se3_inv(T)
    now_dir = mid3 - T_wc[:3, 3]
    now_dir = now_dir / jnp.maximum(
        jnp.linalg.norm(now_dir, axis=-1, keepdims=True), 1e-9)
    view_cos = jnp.sum(avg_dir * now_dir, axis=-1)
    # unobserved lines (cnt == 0) keep visible: no direction evidence yet
    visible = visible & ((cnt < 1.0) | (view_cos > 0.5))

    proj_angle = jnp.arctan2(ub[:, 1] - ua[:, 1], ub[:, 0] - ua[:, 0]) % jnp.pi
    proj_len = jnp.linalg.norm(ub - ua, axis=-1)

    lf_mid = 0.5 * (lfeats.uv_a + lfeats.uv_b)
    d_ang = jnp.abs(lfeats.angle[:, None] - proj_angle[None, :]) % jnp.pi
    d_ang = jnp.minimum(d_ang, jnp.pi - d_ang)
    # perpendicular distance of the feature midpoint to the projected
    # infinite line (robust to extent slide along the line), plus an
    # along-line overlap requirement — the `mutualOverlap` idea of
    # `src/LSDmatcher.cpp:488-625`.
    dirs = (ub - ua) / jnp.maximum(proj_len, 1e-6)[:, None]   # (L,2)
    rel = lf_mid[:, None, :] - mid[None, :, :]                 # (M,L,2)
    d_perp = jnp.abs(rel[..., 0] * (-dirs[None, :, 1])
                     + rel[..., 1] * dirs[None, :, 0])
    d_along = jnp.abs(rel[..., 0] * dirs[None, :, 0]
                      + rel[..., 1] * dirs[None, :, 1])
    overlap = d_along < 0.6 * (lfeats.length[:, None] + proj_len[None, :])
    # length-ratio gate (src/LSDmatcher.cpp:139-143): a detected segment
    # much shorter/longer than the projected map line is usually a
    # different physical edge that happens to be collinear
    lr = jnp.minimum(lfeats.length[:, None], proj_len[None, :]) / \
        jnp.maximum(jnp.maximum(lfeats.length[:, None], proj_len[None, :]),
                    1e-6)

    mask = (visible[None, :] & lfeats.valid[:, None] & (d_ang < angle_tol)
            & (d_perp < radius) & overlap & (lr >= 0.5))
    D = hamming.distance_matrix(lfeats.desc, ms.ln_desc)
    best_idx, best, _ = hamming.masked_best2(D, mask)
    matched = best <= max_dist
    matched = hamming.dedup_by_target(best_idx, matched, best,
                                      ms.ln_valid.shape[0])
    return best_idx, matched, visible


def track_local_map(cam, ms: MapState, feats: PointFeatures, T_last,
                    scale_factors, sigma2_levels, lfeats=None, th: float = 1.0,
                    n_levels: int = 8, scale: float = 1.2,
                    line_info: float = 1.0, velocity=None,
                    vel_gamma: float = 0.8, update_stats: bool = False,
                    anchor_kf=None, kp_ur=None, bf: float = 0.0,
                    max_step_t: float = 0.15, max_step_r: float = 0.35,
                    matcher_backend: str = "xla"):
    """Two-stage tracking as one jitted program, mirroring the reference's
    TrackWithMotionModel -> TrackLocalMap structure (`src/Tracking.cc:1316,
    1491`): a wide-radius search refines the constant-velocity prediction,
    then the tight local-map search + second optimization produces the final
    pose. Both searches reuse ONE Hamming matrix (N x P, computed once on
    the MXU). The damped constant-velocity model lives INSIDE the program
    (host-side eager Lie algebra would cost dozens of device dispatches per
    frame)."""
    if velocity is None:
        velocity = jnp.eye(4)
    T_pred = velocity @ T_last
    D = hamming.distance_matrix(feats.desc, ms.pt_desc)  # (N, P)
    sigma2_kp = sigma2_levels[feats.octave]

    # ALL tracking searches are restricted to the LOCAL map (reference
    # semantics: `TrackLocalMap` only sees covisible keyframes' landmarks,
    # `src/Tracking.cc:1899-2081`) — matching against the whole map would
    # re-associate long-lost landmarks by descriptor alone at loop
    # revisits, silently absorbing drift that the explicit loop-closing
    # stage (Sim3 + essential graph + GBA) is supposed to correct.
    local = local_map_mask(ms, anchor_kf=anchor_kf)

    # Stage 1 — the reference's tracking ladder (`TrackWithMotionModel`
    # then `TrackReferenceKeyFrame` on failure, `src/Tracking.cc:445-460`)
    # as a branch-free SELECT: optimize the windowed motion-model matches
    # and the windowless strict-ratio matches as SEPARATE hypotheses and
    # keep whichever yields more inliers. Mixing the two match sets in one
    # optimization is unstable on repetitive texture: when the prediction
    # is off by more than the texture period, aliased windowed matches and
    # correct ratio matches form competing cost basins.
    idx_w, m_w, _ = _match_against_map(cam, ms, feats, D, T_pred,
                                       scale_factors, th, True, n_levels,
                                       scale, pt_mask=local,
                                       backend=matcher_backend)
    g_mask = feats.valid[:, None] & (ms.pt_valid & local)[None, :]
    g_idx, g_best, g_second = hamming.masked_best2(D, g_mask)
    g_ok = (g_best <= TH_LOW) & (
        g_best.astype(jnp.float32) < 0.7 * g_second.astype(jnp.float32))
    g_ok = hamming.dedup_by_target(g_idx, g_ok, g_best, ms.pt_xyz.shape[0])
    # depth sensors: 3-dof stereo point edges (u_l, v_l, u_r) anchor the
    # metric scale in every pose optimization, like the reference's
    # EdgeStereoSE3ProjectXYZOnlyPose (`src/Optimizer.cc:718-760`)
    stereo_kw = dict(pt_ur=kp_ur, bf=bf) if kp_ur is not None else {}
    res_a = pose_opt.pose_optimize(
        cam, T_pred,
        pose_opt.PoseObs(ms.pt_xyz[idx_w], feats.uv_un, sigma2_kp, m_w,
                         *pose_opt.PoseObs.empty_lines(1), **stereo_kw),
        rounds=2, iters_per_round=5)
    res_b = pose_opt.pose_optimize(
        cam, T_pred,
        pose_opt.PoseObs(ms.pt_xyz[g_idx], feats.uv_un, sigma2_kp, g_ok,
                         *pose_opt.PoseObs.empty_lines(1), **stereo_kw),
        rounds=2, iters_per_round=5)
    take_a = res_a.n_inliers >= jnp.maximum(res_b.n_inliers, 10)
    take_b = ~take_a & (res_b.n_inliers >= 10)
    T_mid = jnp.where(take_a, res_a.T,
                      jnp.where(take_b, res_b.T, T_pred))

    # Stage 2: tight local-map search from the refined pose, points + lines
    # jointly optimized (TrackLocalMapWithLines, src/Tracking.cc:1491)
    idx2, m2, visible = _match_against_map(cam, ms, feats, D, T_mid,
                                           scale_factors, th, False,
                                           n_levels, scale, pt_mask=local,
                                           backend=matcher_backend)
    if lfeats is not None:
        lidx, lm, ln_visible = _match_lines_against_map(cam, ms, lfeats, T_mid)
        L_ends = ms.ln_xyz[lidx]                       # (M, 2, 3)
        ln_xyz_e = jnp.concatenate([L_ends[:, 0], L_ends[:, 1]])   # (2M, 3)
        ln_l2d_e = jnp.concatenate([lfeats.l2d, lfeats.l2d])
        ln_mask_e = jnp.concatenate([lm, lm])
        # reference uses info=1 (src/Optimizer.cc:802); ours is the
        # configurable base (the block-fit line detector has coarser
        # perpendicular noise) scaled per line by its triangulation
        # conditioning (MapState.ln_cond) so short-baseline lines cannot
        # drag the pose
        ln_info_e = line_info * jnp.concatenate(
            [ms.ln_cond[lidx], ms.ln_cond[lidx]])
        obs2 = pose_opt.PoseObs(ms.pt_xyz[idx2], feats.uv_un, sigma2_kp, m2,
                                ln_xyz_e, ln_l2d_e, ln_mask_e, ln_info_e,
                                **stereo_kw)
    else:
        M = 1
        lidx = jnp.zeros((M,), jnp.int32)
        lm = jnp.zeros((M,), bool)
        ln_visible = jnp.zeros(ms.ln_valid.shape, bool)
        obs2 = pose_opt.PoseObs(ms.pt_xyz[idx2], feats.uv_un, sigma2_kp, m2,
                                *pose_opt.PoseObs.empty_lines(1), **stereo_kw)
    # reference parity: PoseOptimization runs 4 rounds x 10 LM iterations
    # (`src/Optimizer.cc:851-863`); the round-2 3x7 saved compute but
    # under-converges exactly when landmarks are good enough to deserve it
    res2 = pose_opt.pose_optimize(cam, T_mid, obs2, rounds=4,
                                  iters_per_round=10)

    # Catastrophic-jump guard (VERDICT r4 item 5): the measured collapse
    # mode is one frame whose aliased matches pull the optimum to a wildly
    # implausible pose; every downstream stage (keyframe creation,
    # triangulation) then corrupts the map before the host even sees the
    # inlier count. Reject the update when the single-frame motion exceeds
    # generous absolute caps (map units are ~unit-median-depth by the init
    # normalization, so 0.15 is ~10x any real inter-frame motion at 30 fps;
    # cf the reference's TrackWithMotionModel->TrackReferenceKeyFrame
    # fallback, src/Tracking.cc:445-460 — this is the layer after both
    # hypotheses fail). A rejected frame coasts on the constant-velocity
    # prediction, binds NO observations, reports 0 inliers (the host's
    # LOST->reloc ladder takes over if it persists), and decays the
    # velocity instead of adopting the garbage estimate — so the map stays
    # clean for relocalization.
    # The translation cap is RELATIVE to the tracked scene depth: monocular
    # init normalizes median depth to ~1 (cap = max_step_t map units), but
    # depth sensors build METRIC maps where the same number would reject
    # ordinary motion — mean inlier depth is the scale proxy either way.
    z2 = se3.transform(T_mid, ms.pt_xyz[idx2])[:, 2]
    n_m2 = jnp.sum(m2.astype(jnp.float32))
    scene_scale = jnp.where(
        n_m2 >= 10.0,
        jnp.sum(jnp.where(m2, z2, 0.0)) / jnp.maximum(n_m2, 1.0), 1.0)
    xi_jump = se3.se3_log(res2.T @ se3.se3_inv(T_last))
    jump_ok = ((jnp.linalg.norm(xi_jump[:3]) <= max_step_r)
               & (jnp.linalg.norm(xi_jump[3:])
                  <= max_step_t * jnp.maximum(scene_scale, 1e-3))
               & jnp.all(jnp.isfinite(res2.T)))
    T_final = jnp.where(jump_ok, res2.T, T_pred)

    inlier = res2.pt_inlier & m2 & jump_ok
    matched_pt = jnp.where(inlier, idx2.astype(jnp.int32), -1)
    M = lm.shape[0]
    ln_ep_in = res2.ln_inlier[:M] & res2.ln_inlier[M:2 * M] if lfeats is not None \
        else jnp.zeros((M,), bool)
    ln_in = lm & ln_ep_in & jump_ok
    matched_ln = jnp.where(ln_in, lidx.astype(jnp.int32), -1)
    n_inl = jnp.sum(inlier.astype(jnp.int32))
    n_ln_inl = jnp.sum(ln_in.astype(jnp.int32))
    n_matched = jnp.sum((matched_pt >= 0).astype(jnp.int32))
    # reference-KF tracked points with >= 3 observations — the comparison
    # base of the keyframe decision (`KeyFrame::TrackedMapPoints(3)`,
    # used by NeedNewKeyFrame at src/Tracking.cc:1608)
    P = ms.pt_xyz.shape[0]
    k_last = jnp.maximum(ms.n_kf - 1, 0)
    row = ms.kf_pt_idx[k_last]
    pid_r = jnp.clip(row, 0, P - 1)
    nref3 = jnp.sum(((row >= 0) & (ms.pt_n_obs[pid_r] >= 3)).astype(jnp.int32))
    # Damped constant-velocity update: raw extrapolation turns estimator
    # wander in weakly-observable directions (plane-dominated views) into
    # exponential divergence (e_{k+1} ~ 2 e_k - e_{k-1}); gamma < 1 moves
    # the error-dynamics roots to {1, gamma}.
    new_velocity = jnp.where(
        jump_ok,
        se3.se3_exp(vel_gamma * xi_jump),
        se3.se3_exp(vel_gamma * se3.se3_log(velocity)))
    result = TrackResult(
        T=T_final,
        matched_pt=matched_pt,
        inlier=inlier,
        n_inliers=n_inl,
        n_visible=jnp.sum(visible.astype(jnp.int32)),
        visible_pts=visible,
        matched_ln=matched_ln,
        ln_inlier=ln_in,
        n_ln_inliers=n_ln_inl,
        visible_lns=ln_visible,
        scalars=jnp.stack([n_inl, n_ln_inl, n_matched, nref3,
                           ms.n_pt, ms.n_ln]),
        velocity=new_velocity,
        T_rel=T_final @ se3.se3_inv(ms.kf_T[k_last]),
    )
    if update_stats:
        # fold the found/visible statistics update into the same program:
        # a separate jit would copy the full MapState across the program
        # boundary every frame
        return result, update_point_stats(ms, result)
    return result


def update_point_stats(ms: MapState, result: TrackResult) -> MapState:
    """Tracking found/visible counters for points AND lines
    (`MapPoint::IncreaseVisible/Found`, `MapLine` equivalents — the 0.25
    found-ratio culling gate inputs)."""
    P = ms.pt_xyz.shape[0]
    vis = ms.pt_visible + result.visible_pts.astype(jnp.int32)
    found_hits = jnp.zeros((P,), jnp.int32).at[
        jnp.clip(result.matched_pt, 0, P - 1)
    ].add((result.matched_pt >= 0).astype(jnp.int32))
    L = ms.ln_valid.shape[0]
    lvis = ms.ln_visible + result.visible_lns.astype(jnp.int32)
    ln_hits = jnp.zeros((L,), jnp.int32).at[
        jnp.clip(result.matched_ln, 0, L - 1)
    ].add((result.matched_ln >= 0).astype(jnp.int32))
    return ms._replace(pt_visible=vis, pt_found=ms.pt_found + found_hits,
                       ln_visible=lvis, ln_found=ms.ln_found + ln_hits)


def match_frames(feats1: PointFeatures, feats2: PointFeatures,
                 max_dist: int = TH_LOW, nn_ratio: float = 0.9,
                 window: float = 100.0, check_rotation: bool = True):
    """Frame-to-frame windowed NN matching — `SearchForInitialization`
    (`src/ORBmatcher.cc:455`) semantics: window around the original
    location, NN ratio, rotation-histogram verification.

    Returns (idx2 (N,), ok (N,)) mapping feats1 slots to feats2 slots."""
    D = hamming.distance_matrix(feats1.desc, feats2.desc)
    du = jnp.abs(feats1.uv[:, 0:1] - feats2.uv[None, :, 0])
    dv = jnp.abs(feats1.uv[:, 1:2] - feats2.uv[None, :, 1])
    mask = (du < window) & (dv < window)
    mask = mask & feats1.valid[:, None] & feats2.valid[None, :]
    # The reference restricts init matching to level 0 but doubles the init
    # feature budget (src/Tracking.cc:148); with a single budget we instead
    # allow all levels with octave agreement — same candidate density.
    mask = mask & (jnp.abs(feats1.octave[:, None] - feats2.octave[None, :]) <= 1)
    idx, bestd, secondd = hamming.masked_best2(D, mask)
    ok = (bestd <= max_dist) & (
        bestd.astype(jnp.float32) < nn_ratio * secondd.astype(jnp.float32))
    if check_rotation:
        dangle = feats1.angle - feats2.angle[idx]
        ok = hamming.rotation_histogram_mask(dangle, ok)
    return idx, ok


def reloc_candidate_mask(ms: MapState, feats: PointFeatures,
                         n_cand: int = 8):
    """Place-recognition gate for relocalization
    (`KeyFrameDatabase::DetectRelocalizationCandidates`,
    `src/KeyFrameDatabase.cc:199`; used by `Tracking::Relocalization`,
    `src/Tracking.cc:2083-2140`): BoW-score the query frame against all
    keyframes, keep the top candidates, and admit only THEIR landmarks
    into the matching stage.  Matching the whole map instead would let a
    kidnap near a drifted revisit relocalize into the geometrically wrong
    side, silently absorbing drift the loop closer should see.

    Returns (pt_mask (P,), cand_ids (n_cand,), cand_valid (n_cand,))."""
    from ..vocab import bow
    K, N = ms.kf_pt_idx.shape
    P = ms.pt_xyz.shape[0]
    q = bow.bow_vector(feats.desc, feats.valid)
    scores = bow.l1_score(q, ms.kf_bow)                         # (K,)
    ids = jnp.arange(K)
    valid = ms.kf_valid & (ids < ms.n_kf)
    sc = jnp.where(valid, scores, -1.0)
    top_sc, top_id = jax.lax.top_k(sc, min(n_cand, K))
    # the reference keeps candidates >= 0.75 * best accumulated score
    # (`src/KeyFrameDatabase.cc:268-303`); apply the same relative gate
    cand_ok = (top_sc > 0) & (top_sc >= 0.75 * top_sc[0])
    rows = ms.kf_pt_idx[top_id]                                 # (C, N)
    rows = jnp.where(cand_ok[:, None], rows, -1)
    pt_mask = jnp.zeros((P,), bool).at[
        jnp.clip(rows, 0, P - 1).reshape(-1)].max((rows >= 0).reshape(-1))
    pt_mask = pt_mask & ms.pt_valid
    # a map with no BoW signal (e.g. hand-built fixtures with empty kf_bow)
    # falls back to the whole map — the pre-gate behavior
    any_cand = jnp.any(cand_ok)
    return jnp.where(any_cand, pt_mask, ms.pt_valid), top_id, cand_ok


def relocalize(cam, ms: MapState, feats: PointFeatures, sigma2_levels, key,
               scale_factors=None, n_levels: int = 8, scale: float = 1.2,
               min_inliers: int = 50):
    """Relocalization from scratch (`Tracking::Relocalization`,
    `src/Tracking.cc:2083`): BoW place-recognition candidate gating
    (`reloc_candidate_mask`), ratio-test matching of frame descriptors
    against the candidate keyframes' landmarks (one MXU matmul), vmapped
    RANSAC PnP, staged-LM refinement, then the reference's acceptance
    ladder (`:2191-2229`): if the first optimization lands under
    `min_inliers` (50), retry with a widening projection-window search
    around the candidate pose and re-optimize before the final >=
    50-inlier verdict.
    Returns (ok, T, n_inliers, anchor_kf) — anchor_kf is the candidate
    keyframe observing the most inliers, used to seed the local-map window
    after a kidnap into an old map region."""
    from ..solvers import pnp as pnp_mod

    pt_mask, cand_ids, cand_ok = reloc_candidate_mask(ms, feats)
    D = hamming.distance_matrix(feats.desc, ms.pt_desc)
    mask = feats.valid[:, None] & pt_mask[None, :]
    idx, best, second = hamming.masked_best2(D, mask)
    ok = (best <= TH_LOW) & (
        best.astype(jnp.float32) < 0.75 * second.astype(jnp.float32))
    ok = hamming.dedup_by_target(idx, ok, best, ms.pt_xyz.shape[0])

    s2 = sigma2_levels[feats.octave]
    res = pnp_mod.ransac_pnp(key, ms.pt_xyz[idx], feats.uv_un, ok, cam, s2)

    obs = pose_opt.PoseObs(ms.pt_xyz[idx], feats.uv_un, s2, ok,
                           *pose_opt.PoseObs.empty_lines(1))
    out = pose_opt.pose_optimize(cam, res.T, obs)

    # acceptance ladder: widen the search around the optimized pose
    # (window th=10 then th=3 in the reference; one wide pass here — the
    # full Hamming matrix makes the wider window free)
    if scale_factors is None:
        scale_factors = jnp.power(scale, jnp.arange(n_levels, dtype=jnp.float32))
    idx2, m2, _ = _match_against_map(cam, ms, feats, D, out.T, scale_factors,
                                     3.0, True, n_levels, scale,
                                     pt_mask=pt_mask)
    obs2 = pose_opt.PoseObs(ms.pt_xyz[idx2], feats.uv_un, s2, m2,
                            *pose_opt.PoseObs.empty_lines(1))
    out2 = pose_opt.pose_optimize(cam, out.T, obs2)

    take2 = (out.n_inliers < min_inliers) & (out2.n_inliers > out.n_inliers)
    T = jnp.where(take2, out2.T, out.T)
    # report the inlier count of the pose actually returned
    n = jnp.where(take2, out2.n_inliers, out.n_inliers)
    in_pt = jnp.where(take2, jnp.where(m2 & out2.pt_inlier, idx2, -1),
                      jnp.where(ok & out.pt_inlier, idx, -1))    # (N,)
    # anchor = candidate keyframe observing the most accepted inliers
    P = ms.pt_xyz.shape[0]
    in_bitmap = jnp.zeros((P,), bool).at[
        jnp.clip(in_pt, 0, P - 1)].max(in_pt >= 0)
    crows = ms.kf_pt_idx[cand_ids]                              # (C, N)
    hits = jnp.sum((in_bitmap[jnp.clip(crows, 0, P - 1)]
                    & (crows >= 0)).astype(jnp.int32), axis=1)  # (C,)
    hits = jnp.where(cand_ok, hits, -1)
    anchor = jnp.where(jnp.any(hits > 0), cand_ids[jnp.argmax(hits)],
                       jnp.maximum(ms.n_kf - 1, 0)).astype(jnp.int32)
    return res.ok & (n >= min_inliers), T, n, anchor
