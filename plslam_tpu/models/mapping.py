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
from ..vocab import bow
from ..optim import local_ba

# max keyframes created during one in-flight GBA that get exact spanning-
# tree parent-walk correction at merge (GBA rounds dispatch once per frame,
# so a GBA spans only a few keyframe insertions; overflow falls back to the
# tip-anchor delta)
GBA_MERGE_MAX_LAG = 16

TH_LOW = 50
CHI2_2D = 5.991


def insert_keyframe(cam, ms: MapState, feats: PointFeatures, T, matched_pt,
                    frame_id, scale_factors, lfeats=None,
                    matched_ln=None, desc_majority: bool = False,
                    kp_depth=None, bf: float = 0.0) -> MapState:
    """Promote the current frame to a keyframe (`CreateNewKeyFrame`,
    `src/Tracking.cc:1666` + `ProcessNewKeyFrame`, `src/LocalMapping.cc:157`):
    write features (points + line segments), bind tracked landmarks,
    refresh their statistics.

    With a depth sensor (`kp_depth` + `bf` = fx*baseline), each keypoint's
    right-image column u_r = u - bf/depth is stored so BA can use 3-dof
    stereo edges (`Frame::ComputeStereoMatches/FromRGBD`,
    `src/Frame.cc:977,1154`)."""
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
        kf_bow=ms.kf_bow.at[k].set(bow.bow_vector(feats.desc, feats.valid)),
        n_kf=ms.n_kf + 1,
    )
    if kp_depth is not None and bf > 0:
        ur = jnp.where(feats.valid & (kp_depth > 0),
                       feats.uv_un[:, 0] - bf / jnp.maximum(kp_depth, 1e-6),
                       -1.0)
        ms = ms._replace(kf_ur=ms.kf_ur.at[k].set(ur))
    if lfeats is not None:
        Lc = ms.ln_valid.shape[0]
        ml = matched_ln if matched_ln is not None else jnp.full(
            lfeats.valid.shape, -1, jnp.int32)
        ms = ms._replace(
            kf_ln_uv=ms.kf_ln_uv.at[k].set(
                jnp.stack([lfeats.uv_a, lfeats.uv_b], axis=-2)),
            kf_ln_l2d=ms.kf_ln_l2d.at[k].set(lfeats.l2d),
            kf_ln_desc=ms.kf_ln_desc.at[k].set(lfeats.desc),
            kf_ln_valid=ms.kf_ln_valid.at[k].set(lfeats.valid),
            kf_ln_idx=ms.kf_ln_idx.at[k].set(ml),
        )
        has_l = ml >= 0
        lid = jnp.clip(ml, 0, Lc - 1)
        ms = ms._replace(
            ln_n_obs=ms.ln_n_obs.at[lid].add(has_l.astype(jnp.int32)),
            ln_desc=ms.ln_desc.at[lid].set(
                jnp.where(has_l[:, None], lfeats.desc, ms.ln_desc[lid])),
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
    # Representative descriptor. Default = latest observation. With
    # `desc_majority`, points with >= 3 samples switch to the bitwise
    # STRICT majority over their observed descriptors — the summed-Hamming
    # minimizer, the TPU-native analog of the reference's min-median-
    # Hamming medoid (`MapPoint::ComputeDistinctiveDescriptors`,
    # src/MapPoint.cc:249). Measured: majority helps point-poor scenes
    # (lines fixture points-only ATE 0.075 -> 0.019) but weakens tracking
    # under viewpoint-drift fixtures (the frozen early-view majority
    # matches late views worse than the latest descriptor), so latest
    # stays the default.
    room = has & (ms.pt_desc_cnt[pid] < 255)
    acc = ms.pt_desc_acc.at[pid].add(
        jnp.where(room[:, None], feats.desc, 0).astype(jnp.uint8))
    cnt = ms.pt_desc_cnt.at[pid].add(room.astype(jnp.int32))
    rep = feats.desc
    if desc_majority:
        # strict > (ties -> 0): with >= a 2-sample 'majority' would be the
        # bitwise OR of the two descriptors — far from both
        maj = (2 * acc[pid].astype(jnp.int32)
               > jnp.maximum(cnt[pid], 1)[:, None]).astype(jnp.uint8)
        rep = jnp.where((cnt[pid] >= 3)[:, None], maj, rep)
    # invalid lanes clip pid to 0 — route them to the out-of-bounds dump
    # (mode="drop") instead of letting duplicate index-0 writes race the
    # real update (a where() over the gathered old value does NOT prevent
    # the scatter collision)
    pid_w = jnp.where(has, pid, P)
    new_desc = ms.pt_desc.at[pid_w].set(rep, mode="drop")
    return ms._replace(pt_normal=new_normal, pt_desc=new_desc,
                       pt_desc_acc=acc, pt_desc_cnt=cnt)


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
                      scale_factors, nn_ratio: float = 0.6,
                      min_baseline_depth: float = 0.01) -> MapState:
    """Triangulate new map points between two keyframes
    (`CreateNewMapPoints`, `src/LocalMapping.cc:329`): epipolar-gated
    Hamming matching of yet-unmatched keypoints, batched DLT, then the
    reference's acceptance gates (cheirality, parallax, reprojection,
    scale consistency), appended with prefix-sum slots.

    The whole pair is skipped when baseline / median scene depth <
    `min_baseline_depth` (the reference's mono gate, `LocalMapping.cc:
    ~400` `ratioBaselineDepth < 0.01 -> continue`): triangulating at that
    conditioning yields depth noise of sigma_z/z ~ (z / (fx b)) per pixel
    — tens of percent — and such landmarks poison tracking and BA. Pairs
    here are masked arrays, so 'skip' = mask the creation flags."""
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

    # pair-level conditioning gate: baseline vs median depth of the new
    # keyframe's already-matched landmarks (medianDepthKF2 analog)
    baseline = jnp.linalg.norm(c1 - c2)
    obs_idx = ms.kf_pt_idx[k_new]
    obs_ok = (obs_idx >= 0) & ms.pt_valid[jnp.clip(obs_idx, 0, P - 1)]
    z_obs = se3.transform(T1, ms.pt_xyz[jnp.clip(obs_idx, 0, P - 1)])[:, 2]
    z_sorted = jnp.sort(jnp.where(obs_ok, z_obs, jnp.inf))
    n_obs_med = jnp.sum(obs_ok.astype(jnp.int32))
    med_depth = z_sorted[jnp.clip(n_obs_med // 2, 0, N - 1)]
    # no observed landmarks yet (fresh init): fall back to permissive
    pair_ok = jnp.where(
        (n_obs_med >= 10) & jnp.isfinite(med_depth),
        baseline >= min_baseline_depth * med_depth, True)

    create = (ok & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.9998)
              & (e1 < CHI2_2D) & (e2 < CHI2_2D) & scale_ok & pair_ok)

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
        pt_desc_acc=ms.pt_desc_acc.at[slots].set(jnp.where(
            a[:, None], ms.kf_desc[k_new], ms.pt_desc_acc[slots])),
        pt_desc_cnt=ms.pt_desc_cnt.at[slots].set(
            jnp.where(a, 1, ms.pt_desc_cnt[slots])),
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


def third_view_support(cam, ms: MapState, k3, Xa, Xb,
                       angle_tol: float = 0.3, dist_tol: float = 4.0):
    """3-view consistency for candidate 3D lines — the role of
    `CreateNewMapLinesConstraint` (`src/LocalMapping.cc:875`): a candidate
    (Xa, Xb) is supported if SOME detected segment in keyframe `k3` agrees
    with its projection (direction + both endpoints near that segment's
    infinite line). Returns (Mc,) bool."""
    T3 = ms.kf_T[k3]
    Pa = se3.transform(T3, Xa)
    Pb = se3.transform(T3, Xb)

    def px(Q):
        iz = 1.0 / jnp.maximum(Q[:, 2], 1e-6)
        return jnp.stack([cam.fx * Q[:, 0] * iz + cam.cx,
                          cam.fy * Q[:, 1] * iz + cam.cy], -1)

    qa, qb = px(Pa), px(Pb)
    cheir = (Pa[:, 2] > 0) & (Pb[:, 2] > 0)
    proj_ang = jnp.arctan2(qb[:, 1] - qa[:, 1], qb[:, 0] - qa[:, 0]) % jnp.pi

    l3 = ms.kf_ln_l2d[k3]                        # (M3, 3) unit-normal lines
    uv3 = ms.kf_ln_uv[k3]
    ang3 = jnp.arctan2(uv3[:, 1, 1] - uv3[:, 0, 1],
                       uv3[:, 1, 0] - uv3[:, 0, 0]) % jnp.pi
    d_ang = jnp.abs(proj_ang[:, None] - ang3[None, :]) % jnp.pi
    d_ang = jnp.minimum(d_ang, jnp.pi - d_ang)

    def dist_to(l, q):                            # (Mc, M3)
        return jnp.abs(l[None, :, 0] * q[:, None, 0]
                       + l[None, :, 1] * q[:, None, 1] + l[None, :, 2])

    near = (dist_to(l3, qa) < dist_tol) & (dist_to(l3, qb) < dist_tol)
    ok = near & (d_ang < angle_tol) & ms.kf_ln_valid[k3][None, :]
    return cheir & jnp.any(ok, axis=1)


def create_new_lines(cam, ms: MapState, k_new, k_ref,
                     nn_ratio: float = 0.75, max_dist: int = 50,
                     angle_tol: float = 0.29, k_third=None,
                     min_cond: float = 2e-4) -> MapState:
    """Triangulate new map lines between two keyframes — the 2-view core of
    `CreateNewMapLines` (`src/LocalMapping.cc:597`): mutual-best Hamming
    matching of unbound segments with direction agreement (gap gate scaled
    by the match-distance MAD, `src/LSDmatcher.cpp:474-484`),
    plane-intersection triangulation, then cheirality / parallax-degeneracy
    / endpoint reprojection gates. With `k_third`, candidates additionally
    need third-view support (`CreateNewMapLinesConstraint`,
    `src/LocalMapping.cc:875`)."""
    Lc = ms.ln_valid.shape[0]
    M = ms.kf_ln_valid.shape[1]
    T1 = ms.kf_T[k_new]
    T2 = ms.kf_T[k_ref]

    free1 = ms.kf_ln_valid[k_new] & (ms.kf_ln_idx[k_new] < 0)
    free2 = ms.kf_ln_valid[k_ref] & (ms.kf_ln_idx[k_ref] < 0)

    uv1 = ms.kf_ln_uv[k_new]   # (M, 2, 2)
    uv2 = ms.kf_ln_uv[k_ref]
    ang1 = jnp.arctan2(uv1[:, 1, 1] - uv1[:, 0, 1],
                       uv1[:, 1, 0] - uv1[:, 0, 0]) % jnp.pi
    ang2 = jnp.arctan2(uv2[:, 1, 1] - uv2[:, 0, 1],
                       uv2[:, 1, 0] - uv2[:, 0, 0]) % jnp.pi
    d_ang = jnp.abs(ang1[:, None] - ang2[None, :]) % jnp.pi
    d_ang = jnp.minimum(d_ang, jnp.pi - d_ang)

    D = hamming.distance_matrix(ms.kf_ln_desc[k_new], ms.kf_ln_desc[k_ref])
    mask = free1[:, None] & free2[None, :] & (d_ang < angle_tol)
    idx2, best, second = hamming.masked_best2(D, mask)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    # adaptive 1st-vs-2nd gap gate scaled by the MAD of the match distances
    # (`lineDescriptorMAD` + `dist12 > 0.5*MAD` gate, src/LSDmatcher.cpp:
    # 474-484 / src/ExtractLineSegment.cpp:49)
    mad = hamming.vector_mad(best, ok & (best < hamming.INVALID))
    gap = (second - best).astype(jnp.float32)
    ok = ok & (gap > 0.5 * mad)
    Dm = jnp.where(mask, D, hamming.INVALID)
    rev = jnp.argmin(Dm, axis=0)
    ok = ok & (rev[idx2] == jnp.arange(M))

    # triangulate: view-1 endpoint rays x view-2 back-projected plane
    uv2m = uv2[idx2]
    Xa, Xb, da, db = tri.triangulate_line_two_view(
        cam, T1, T2, uv1[:, 0], uv1[:, 1], uv2m[:, 0], uv2m[:, 1])
    finite = jnp.all(jnp.isfinite(Xa), -1) & jnp.all(jnp.isfinite(Xb), -1)

    # epipolar/parallax degeneracy: angle between the two back-projected
    # planes' normals must exceed ~1 deg (cf the |cos|>0.998 gates,
    # src/Initializer.cc:1255, src/LocalMapping.cc:1078)
    l1 = tri.line_from_endpoints_2d(uv1[:, 0], uv1[:, 1])
    l2 = tri.line_from_endpoints_2d(uv2m[:, 0], uv2m[:, 1])
    n1 = tri.backproject_plane(cam, T1, l1)[:, :3]
    n2 = tri.backproject_plane(cam, T2, l2)[:, :3]
    cosn = jnp.abs(jnp.sum(n1 * n2, -1)) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-9)
    nondegenerate = cosn < 0.9998

    # cheirality in both views + endpoint reprojection onto observed lines
    def reproj_line_err(T, l, Xa, Xb):
        Pa = se3.transform(T, Xa)
        Pb = se3.transform(T, Xb)
        za, zb = Pa[:, 2], Pb[:, 2]

        def px(Q):
            iz = 1.0 / jnp.maximum(Q[:, 2], 1e-6)
            return jnp.stack([cam.fx * Q[:, 0] * iz + cam.cx,
                              cam.fy * Q[:, 1] * iz + cam.cy], -1)

        qa, qb = px(Pa), px(Pb)
        ea = jnp.abs(l[:, 0] * qa[:, 0] + l[:, 1] * qa[:, 1] + l[:, 2])
        eb = jnp.abs(l[:, 0] * qb[:, 0] + l[:, 1] * qb[:, 1] + l[:, 2])
        return jnp.maximum(ea, eb), (za > 0) & (zb > 0)

    e1, chei1 = reproj_line_err(T1, l1, Xa, Xb)
    e2, chei2 = reproj_line_err(T2, l2, Xa, Xb)

    # reasonable extent (reject near-infinite endpoints from parallel
    # planes). Scale-aware: compare against the median depth of the map's
    # valid points (the init normalizes it to ~1).
    seg_len = jnp.linalg.norm(Xb - Xa, axis=-1)
    c1 = se3.se3_inv(T1)[:3, 3]
    d_mid = jnp.linalg.norm(0.5 * (Xa + Xb) - c1, axis=-1)
    pt_d = jnp.linalg.norm(ms.pt_xyz - c1, axis=-1)
    scene_d = jnp.median(jnp.where(ms.pt_valid, pt_d, jnp.nan))
    scene_d = jnp.nan_to_num(scene_d, nan=1.0)
    sane = (seg_len < 3.0 * scene_d) & (d_mid < 10.0 * scene_d)

    create = (ok & finite & nondegenerate & chei1 & chei2
              & (e1 < 4.0) & (e2 < 4.0) & (da > 0) & (db > 0) & sane)
    if k_third is not None:
        create = create & third_view_support(cam, ms, k_third, Xa, Xb)

    # baseline-aware triangulation-conditioning GATE (VERDICT r2 #2; the
    # reference gates 3-view lines on parallax/depth-ratio/length/reproj,
    # `src/LocalMapping.cc:1078-1416`).  metric = (b/z) * sin(theta):
    # baseline-to-depth ratio times the angle between the two
    # back-projected planes — endpoint depth sigma scales as its inverse.
    # Measured on the shared seed-9 orbit scene: the dense-cadence stress
    # regime (scripts/long_run.py --cpu), whose 2-view lines corrupt
    # local BA at full weight, triangulates at metric 4.5e-5..1e-4, while
    # the healthy regime (tests/test_lines_help.py, where full-weight
    # lines CUT ATE ~3x) sits at 4e-4..1e-3 — two orders of magnitude of
    # separation, so a hard creation gate at 2e-4 replaces the former
    # global track_line_info escape hatch.  Survivors keep FULL weight
    # (ln_cond = 1 at and above the gate): a soft ramp above the gate was
    # measured to cost accuracy in regimes where borderline lines still
    # help (rgbd metric ATE 0.026 -> 0.031 on tests/test_depth_sensors),
    # and Huber robustness already bounds any residual damage.
    c2 = se3.se3_inv(T2)[:3, 3]
    c1_ = se3.se3_inv(T1)[:3, 3]
    bline = jnp.linalg.norm(c1_ - c2)
    z_mid = jnp.maximum(0.5 * (da + db), 1e-6)
    sin_th = jnp.sqrt(jnp.maximum(1.0 - cosn * cosn, 0.0))
    metric = (bline / z_mid) * sin_th
    create = create & (metric >= min_cond)
    cond = jnp.clip(metric / jnp.maximum(min_cond, 1e-9), 0.0, 1.0)

    slots, accepted, n_ln_new = mstate.append_slots(ms.n_ln, create, Lc)
    a = accepted
    ln_pair = jnp.stack([Xa, Xb], axis=1)  # (M, 2, 3)
    ms = ms._replace(
        ln_xyz=ms.ln_xyz.at[slots].set(
            jnp.where(a[:, None, None], ln_pair, ms.ln_xyz[slots])),
        ln_desc=ms.ln_desc.at[slots].set(
            jnp.where(a[:, None], ms.kf_ln_desc[k_new], ms.ln_desc[slots])),
        ln_valid=ms.ln_valid.at[slots].set(jnp.where(a, True, ms.ln_valid[slots])),
        ln_first_kf=ms.ln_first_kf.at[slots].set(
            jnp.where(a, k_new, ms.ln_first_kf[slots])),
        ln_n_obs=ms.ln_n_obs.at[slots].set(jnp.where(a, 2, ms.ln_n_obs[slots])),
        ln_visible=ms.ln_visible.at[slots].set(jnp.where(a, 1, ms.ln_visible[slots])),
        ln_found=ms.ln_found.at[slots].set(jnp.where(a, 1, ms.ln_found[slots])),
        ln_cond=ms.ln_cond.at[slots].set(jnp.where(a, cond, ms.ln_cond[slots])),
        n_ln=n_ln_new,
    )
    lid = jnp.where(a, slots.astype(jnp.int32), -1)
    row_new = jnp.where(a, lid, ms.kf_ln_idx[k_new])
    ms = ms._replace(kf_ln_idx=ms.kf_ln_idx.at[k_new].set(row_new))
    row_ref = ms.kf_ln_idx[k_ref].at[idx2].set(
        jnp.where(a, lid, ms.kf_ln_idx[k_ref][idx2]))
    return ms._replace(kf_ln_idx=ms.kf_ln_idx.at[k_ref].set(row_ref))


class BASelection(NamedTuple):
    """Everything `ba_writeback` needs to map a solved fixed-shape BA window
    back onto the full map state."""
    prob: local_ba.BAProblem
    ids_c: jnp.ndarray       # (W,) global kf ids (clipped)
    kf_mask: jnp.ndarray     # (W,)
    sel: jnp.ndarray         # (p_ba,) global point ids
    sel_ok: jnp.ndarray      # (p_ba,)
    lsel: jnp.ndarray        # (l_ba,) global line ids
    lsel_ok: jnp.ndarray     # (l_ba,)
    slot_safe: jnp.ndarray   # (W, N) BA slot per keypoint
    has: jnp.ndarray         # (W, N)
    l_slot_safe: jnp.ndarray  # (W, Mf)
    l_has: jnp.ndarray       # (W, Mf)
    win_pt_idx: jnp.ndarray  # (W, N) bindings at selection time
    win_ln_idx: jnp.ndarray  # (W, Mf)


def run_local_ba(cam, ms: MapState, sigma2_levels, window: int = 8,
                 p_ba: int = 4096, l_ba: int = 512, iters_a: int = 5,
                 iters_b: int = 10, rank_by_obs: bool = False,
                 use_stereo: bool = False, bf: float = 0.0) -> MapState:
    """Local BA over the last `window` keyframes
    (`LocalBundleAdjustmentWithLine`, `src/Optimizer.cc:1645`): the two
    oldest window slots are fixed (pinning the monocular scale gauge — one
    fixed camera leaves an exact scale-about-its-center null direction),
    points and lines observed by the window are selected into fixed-size BA
    slots, outlier observations erased afterward."""
    selection = ba_select(ms, sigma2_levels, window=window, p_ba=p_ba,
                          l_ba=l_ba, rank_by_obs=rank_by_obs,
                          use_stereo=use_stereo, bf=bf)
    res = local_ba.bundle_adjust(selection.prob, cam, iters_a=iters_a,
                                 iters_b=iters_b)
    return ba_writeback(ms, selection, res)


def ba_select(ms: MapState, sigma2_levels, window: int = 8,
              p_ba: int = 4096, l_ba: int = 512,
              rank_by_obs: bool = False,
              n_fixed_tail: int = 0,
              use_stereo: bool = False, bf: float = 0.0) -> BASelection:
    """Select the last `window` keyframes + their observed landmarks into a
    fixed-shape :class:`BAProblem` (the window-selection half of
    `LocalBundleAdjustmentWithLine`).

    `n_fixed_tail` extra keyframes PRECEDING the window enter as FIXED
    cameras whose observations constrain the selected landmarks without
    being optimized — the reference's lFixedCameras (`src/Optimizer.cc:
    1699-1716`: every KF outside the local window that sees a local point).
    On a sequential trajectory those observers are overwhelmingly the
    immediately preceding keyframes, so a fixed tail captures them at
    static shape. MEASURED WORSE on the photo-room head-to-head (170-frame
    probe: keyframe ATE 0.031 tail=0 vs 0.040 tail=4): under monocular
    drift the fixed tail anchors the window to already-drifted poses and
    propagates their error, so it defaults OFF — the negative result is
    kept because metric-scale sensors (stereo/RGBD), where old poses don't
    carry scale drift, are the regime the reference designed it for.
    Ignored for the global problem (rank_by_obs=True), where the window
    already spans the map.

    `rank_by_obs` picks the cap policy when the landmark budget binds:
    False = prefer recent ids (LOCAL BA: freshly-triangulated points need
    the refinement most); True = prefer well-observed ids (GLOBAL BA after
    a loop: the fused cross-loop landmarks are the oldest ids and carry the
    coupling — raw recency would drop them and leave the early keyframes
    unconstrained)."""
    # BA slot budgets can't exceed the map capacities (small test configs)
    p_ba = min(p_ba, ms.pt_xyz.shape[0])
    l_ba = min(l_ba, ms.ln_valid.shape[0])
    window = min(window, ms.kf_T.shape[0])
    K_all = ms.kf_T.shape[0]
    P = ms.pt_xyz.shape[0]
    N = ms.kf_uv.shape[1]
    n_tail = 0 if rank_by_obs else min(n_fixed_tail, K_all - window)
    W = window + n_tail

    k_new = ms.n_kf - 1
    ids = k_new - W + 1 + jnp.arange(W)         # (W,) global kf ids
    kf_ok = (ids >= 0) & (ids < K_all)
    ids_c = jnp.clip(ids, 0, K_all - 1)
    kf_mask = kf_ok & ms.kf_valid[ids_c]
    # fixed cameras: the observer tail, plus (gauge safety) the two oldest
    # valid slots — 2 fixed cameras pin the monocular scale gauge even when
    # the map is too young to have a tail
    first_valid = jnp.argmax(kf_mask)
    second_valid = jnp.argmax(kf_mask & (jnp.arange(W) != first_valid))
    kf_fixed = ((jnp.arange(W) == first_valid)
                | (jnp.arange(W) == second_valid)
                | ((jnp.arange(W) < n_tail) & kf_mask))
    # landmark SELECTION excludes only the observer tail; the gauge-fixed
    # in-window cameras still nominate landmarks (their points are
    # optimized even though their poses are pinned)
    free_mask = kf_mask & (jnp.arange(W) >= n_tail)

    # --- select points observed by the FREE window (the fixed tail only
    # contributes observations of already-selected landmarks) ---
    win_pt_idx = ms.kf_pt_idx[ids_c]             # (W, N)
    win_obs = (win_pt_idx >= 0) & kf_mask[:, None]
    win_obs_sel = (win_pt_idx >= 0) & free_mask[:, None]
    pid_safe = jnp.clip(win_pt_idx, 0, P - 1)
    observed = jnp.zeros((P,), bool)
    observed = observed.at[pid_safe.reshape(-1)].max(win_obs_sel.reshape(-1))
    observed = observed & ms.pt_valid
    if rank_by_obs:
        rank = jnp.clip(ms.pt_n_obs, 0, 32767) * 32768 \
            + (jnp.arange(P, dtype=jnp.int32) >> 3)
    else:
        rank = jnp.arange(P, dtype=jnp.int32)
    scores = jnp.where(observed, rank, -1)
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
    # stereo: right-image column per observation (3-dof edges in BA,
    # `EdgeStereoSE3ProjectXYZ`); mono windows keep obs_ur=None so the
    # 2-component program is unchanged
    obs_ur = None
    if use_stereo:
        obs_ur = jnp.full((W, p_ba), -1.0)
        obs_ur = jax.vmap(lambda o, s, u, h: o.at[s].set(
            jnp.where(h, u, o[s])))(obs_ur, slot_safe, ms.kf_ur[ids_c], has)

    # --- select lines observed by the window (same scheme as points) ---
    Lc = ms.ln_valid.shape[0]
    Mf = ms.kf_ln_valid.shape[1]
    win_ln_idx = ms.kf_ln_idx[ids_c]              # (W, Mf)
    win_ln_obs = (win_ln_idx >= 0) & kf_mask[:, None]
    win_ln_sel = (win_ln_idx >= 0) & free_mask[:, None]
    lid_safe = jnp.clip(win_ln_idx, 0, Lc - 1)
    l_observed = jnp.zeros((Lc,), bool)
    l_observed = l_observed.at[lid_safe.reshape(-1)].max(win_ln_sel.reshape(-1))
    l_observed = l_observed & ms.ln_valid
    l_scores = jnp.where(l_observed, jnp.arange(Lc, dtype=jnp.int32), -1)
    _, lsel = jax.lax.top_k(l_scores, l_ba)
    lsel_ok = l_observed[lsel]
    l_lookup = jnp.full((Lc,), -1, jnp.int32).at[lsel].set(
        jnp.where(lsel_ok, jnp.arange(l_ba, dtype=jnp.int32), -1))

    l_slot = jnp.where(win_ln_obs, l_lookup[lid_safe], -1)  # (W, Mf)
    l_has = l_slot >= 0
    l_slot_safe = jnp.clip(l_slot, 0, l_ba - 1)
    ln_obs_l2d = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, -1e9], jnp.float32), (W, l_ba, 3))
    ln_obs_l2d = jax.vmap(lambda o, s, u, h: o.at[s].set(
        jnp.where(h[:, None], u, o[s])))(ln_obs_l2d, l_slot_safe,
                                         ms.kf_ln_l2d[ids_c], l_has)
    ln_obs_mask = jnp.zeros((W, l_ba), bool)
    ln_obs_mask = jax.vmap(lambda o, s, h: o.at[s].max(h))(
        ln_obs_mask, l_slot_safe, l_has)

    prob = local_ba.BAProblem(
        kf_T=ms.kf_T[ids_c],
        kf_fixed=kf_fixed | ~kf_mask,
        kf_mask=kf_mask,
        pt_xyz=ms.pt_xyz[sel],
        pt_mask=sel_ok,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        obs_sigma2=obs_s2,
        ln_xyz=ms.ln_xyz[lsel],
        ln_mask=lsel_ok,
        ln_obs_l2d=ln_obs_l2d,
        ln_obs_mask=ln_obs_mask,
        # base 0.5 (`src/Optimizer.cc:1909`) x triangulation conditioning:
        # a short-baseline line has endpoint depth variance ~ (z/(b sin th))^2
        # and must not outvote the points in the window (round-2 failure
        # mode: 2-view lines created right after init corrupted local BA)
        ln_info=0.5 * ms.ln_cond[lsel],
        obs_ur=obs_ur,
        bf=bf,
    )
    return BASelection(prob, ids_c, kf_mask, sel, sel_ok, lsel, lsel_ok,
                       slot_safe, has, l_slot_safe, l_has,
                       win_pt_idx, win_ln_idx)


def ba_writeback(ms: MapState, s: BASelection, res) -> MapState:
    """Write a solved BA window back into the map: poses, points,
    endpoint-re-pinned lines, and erase outlier observations
    (`src/Optimizer.cc:2044-2099`)."""
    ids_c, kf_mask = s.ids_c, s.kf_mask
    sel, sel_ok, lsel, lsel_ok = s.sel, s.sel_ok, s.lsel, s.lsel_ok
    slot_safe, has, l_slot_safe, l_has = (s.slot_safe, s.has, s.l_slot_safe,
                                          s.l_has)
    win_pt_idx, win_ln_idx = s.win_pt_idx, s.win_ln_idx

    # Masked scatters are phrased gather-free: invalid slots get an
    # out-of-bounds index and mode="drop" discards them, instead of
    # .at[ids].set(where(ok, new, x[ids])). Equivalent, cheaper (no
    # gather), and avoids a scatter-fused-with-gather pattern that the
    # 2026-08 TPU compiler's sorted-scatter emitter CHECK-fails on
    # (fusion_emitter.cc:4796 GetGatherType == kSublaneGather).
    K_all = ms.kf_T.shape[0]
    ids_kf = jnp.where(kf_mask, ids_c, K_all)
    new_kf_T = ms.kf_T.at[ids_kf].set(res.kf_T, mode="drop")
    P_all = ms.pt_xyz.shape[0]
    new_pt = ms.pt_xyz.at[jnp.where(sel_ok, sel, P_all)].set(
        jax.lax.optimization_barrier(res.pt_xyz), mode="drop")
    # The endpoint-to-infinite-line residual leaves each endpoint's
    # along-line direction unconstrained (an exact null space); LM noise
    # slides endpoints off to infinity. Keep the OPTIMIZED infinite line but
    # re-pin each endpoint at the closest point to its pre-BA position.
    old_ln = ms.ln_xyz[lsel]                       # (l_ba, 2, 3)
    new_a, new_b = res.ln_xyz[:, 0], res.ln_xyz[:, 1]
    d = new_b - new_a
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    ta = jnp.sum((old_ln[:, 0] - new_a) * d, axis=-1)
    tb = jnp.sum((old_ln[:, 1] - new_a) * d, axis=-1)
    pinned = jnp.stack([new_a + ta[:, None] * d, new_a + tb[:, None] * d], axis=1)
    L_all = ms.ln_xyz.shape[0]
    new_ln = ms.ln_xyz.at[jnp.where(lsel_ok, lsel, L_all)].set(
        jax.lax.optimization_barrier(pinned), mode="drop")

    # --- erase outlier observations (src/Optimizer.cc:2044-2067) ---
    obs_bad = s.prob.obs_mask & ~res.obs_inlier   # (W, p_ba)
    bad_here = has & jax.vmap(lambda b, s: b[s])(obs_bad, slot_safe)  # (W, N)
    new_rows = jnp.where(bad_here, -1, win_pt_idx)
    new_kf_pt_idx = ms.kf_pt_idx.at[ids_kf].set(
        jax.lax.optimization_barrier(new_rows), mode="drop")
    l_obs_bad = s.prob.ln_obs_mask & ~res.ln_obs_inlier
    l_bad_here = l_has & jax.vmap(lambda b, s: b[s])(l_obs_bad, l_slot_safe)
    l_new_rows = jnp.where(l_bad_here, -1, win_ln_idx)
    new_kf_ln_idx = ms.kf_ln_idx.at[ids_kf].set(
        jax.lax.optimization_barrier(l_new_rows), mode="drop")

    ms = ms._replace(kf_T=new_kf_T, pt_xyz=new_pt, ln_xyz=new_ln,
                     kf_pt_idx=new_kf_pt_idx, kf_ln_idx=new_kf_ln_idx)
    # refresh n_obs for selected points from global incidence
    inc = mstate.observers_of_points(ms)
    return ms._replace(pt_n_obs=jnp.sum(inc, axis=0).astype(jnp.int32))


def gba_merge(ms: MapState, s: BASelection, res, kf_T_old, start_kf
              ) -> MapState:
    """Merge an asynchronously-completed global BA into the CURRENT map —
    `RunGlobalBundleAdjustment` (`src/LoopClosing.cc:645-750`) semantics:

    - keyframes/landmarks in the BA window get their optimized values;
    - keyframes created DURING the BA are corrected through their SPANNING-
      TREE PARENT (the earlier keyframe sharing the most observations,
      `KeyFrame::UpdateConnections` first-connection rule) exactly as the
      reference walks the tree (`src/LoopClosing.cc:678-738`): each new
      keyframe keeps its relative pose to its corrected parent.  Chains of
      new keyframes resolve in index order (parents always precede
      children); a keyframe that relocalized into an OLD region mid-GBA
      propagates through that region's corrected pose, not the window tip
      (VERDICT r2 #7 — the former single anchor-delta assumed tip
      chaining).  Up to GBA_MERGE_MAX_LAG keyframes get the parent walk;
      any overflow beyond that falls back to the tip-anchor delta;
    - landmarks outside the BA (created during it, or beyond the selection
      cap) are re-mapped through their reference keyframe's old->new
      correction, `X' = Twc_ref_new (Tcw_ref_old X)` (`:713-735`).

    No observation erasure: the reference's GBA runs robust=false and never
    edits the graph (`src/LoopClosing.cc:651`), and bindings may have
    changed while the BA was in flight."""
    K = ms.kf_T.shape[0]
    K_old = kf_T_old.shape[0]
    P = ms.pt_xyz.shape[0]
    ids = jnp.arange(K)

    # 1) optimized window poses
    kf_T = ms.kf_T.at[s.ids_c].set(
        jnp.where(s.kf_mask[:, None, None], res.kf_T, ms.kf_T[s.ids_c]))

    # old pose table: BA-start snapshot for pre-BA keyframes, creation
    # pose for keyframes born during the BA
    old_all = ms.kf_T.at[:K_old].set(kf_T_old)
    old_all = jnp.where((ids < start_kf)[:, None, None], old_all, ms.kf_T)

    # 2) tip-anchor fallback for keyframes created during the BA beyond
    # the parent-walk window (overflow safety net only)
    anchor = jnp.clip(start_kf - 1, 0, K - 1)
    anchor_old = kf_T_old[jnp.clip(anchor, 0, K_old - 1)]
    anchor_new = kf_T[anchor]
    delta = se3.se3_inv(anchor_old) @ anchor_new      # cam_old -> cam_new
    prop = ms.kf_T @ delta                            # Tcw_k ∘ delta
    kf_T = jnp.where(((ids >= start_kf) & ms.kf_valid)[:, None, None],
                     prop, kf_T)

    # 2b) SPANNING-TREE parent walk for the first GBA_MERGE_MAX_LAG
    # keyframes created during the BA (`src/LoopClosing.cc:678-738`):
    # parent = earlier keyframe with max shared observations (first-
    # connection rule, `src/KeyFrame.cc:408-413`, >= 15 else temporal
    # predecessor); child keeps its relative pose to the CORRECTED
    # parent.  Chained parents resolve in scan order (parent index <
    # child index always).
    lag = GBA_MERGE_MAX_LAG
    ks = jnp.clip(start_kf + jnp.arange(lag), 0, K - 1)
    Wn = mstate.covis_rows(ms, ks)                       # (lag, K)
    earlier = ids[None, :] < ks[:, None]
    Wm = jnp.where(earlier, Wn, -1)
    par = jnp.argmax(Wm, axis=1)
    par = jnp.where(Wm[jnp.arange(lag), par] >= 15, par,
                    jnp.maximum(ks - 1, 0))

    def walk(T_tab, i):
        k, p = ks[i], par[i]
        T_new = ms.kf_T[k] @ se3.se3_inv(old_all[p]) @ T_tab[p]
        upd = (k >= start_kf) & (k < ms.n_kf) & ms.kf_valid[k]
        return T_tab.at[k].set(jnp.where(upd, T_new, T_tab[k])), None

    kf_T, _ = jax.lax.scan(walk, kf_T, jnp.arange(lag))
    new_all = kf_T

    # 3) landmarks: BA values for the selected, ref-KF re-map for the rest
    sel_mask = jnp.zeros((P,), bool).at[s.sel].max(s.sel_ok)
    pt_xyz = ms.pt_xyz.at[s.sel].set(
        jnp.where(s.sel_ok[:, None], res.pt_xyz, ms.pt_xyz[s.sel]))
    ref = jnp.clip(ms.pt_first_kf, 0, K - 1)
    Xc = se3.transform(old_all[ref], ms.pt_xyz)
    Xw = se3.transform(se3.se3_inv(new_all[ref]), Xc)
    pt_xyz = jnp.where((ms.pt_valid & ~sel_mask)[:, None], Xw, pt_xyz)

    Lc = ms.ln_valid.shape[0]
    lsel_mask = jnp.zeros((Lc,), bool).at[s.lsel].max(s.lsel_ok)
    # endpoint re-pinning (same null-space guard as ba_writeback)
    old_ln = ms.ln_xyz[s.lsel]
    new_a, new_b = res.ln_xyz[:, 0], res.ln_xyz[:, 1]
    d = new_b - new_a
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    ta = jnp.sum((old_ln[:, 0] - new_a) * d, axis=-1)
    tb = jnp.sum((old_ln[:, 1] - new_a) * d, axis=-1)
    pinned = jnp.stack([new_a + ta[:, None] * d, new_a + tb[:, None] * d], 1)
    ln_xyz = ms.ln_xyz.at[s.lsel].set(
        jnp.where(s.lsel_ok[:, None, None], pinned, ms.ln_xyz[s.lsel]))
    lref = jnp.clip(ms.ln_first_kf, 0, K - 1)
    Tl_old = old_all[lref]
    Tl_new_inv = se3.se3_inv(new_all[lref])
    def remap_ep(e):
        return se3.transform(Tl_new_inv, se3.transform(Tl_old, e))
    ln_remap = jnp.stack([remap_ep(ms.ln_xyz[:, 0]),
                          remap_ep(ms.ln_xyz[:, 1])], 1)
    ln_xyz = jnp.where((ms.ln_valid & ~lsel_mask)[:, None, None],
                       ln_remap, ln_xyz)

    return ms._replace(kf_T=kf_T, pt_xyz=pt_xyz, ln_xyz=ln_xyz)


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

    # lines: same probation rules (`MapLineCulling`, src/LocalMapping.cc:287)
    l_age = k_now - ms.ln_first_kf
    l_ratio = ms.ln_found.astype(jnp.float32) / jnp.maximum(
        ms.ln_visible.astype(jnp.float32), 1.0)
    l_bad = ms.ln_valid & (l_age < 3) & (
        (l_ratio < 0.1) | ((l_age >= 2) & (ms.ln_n_obs <= 2)))
    ln_valid = ms.ln_valid & ~l_bad
    Lc = ms.ln_valid.shape[0]
    l_safe = jnp.clip(ms.kf_ln_idx, 0, Lc - 1)
    kf_ln_idx = jnp.where((ms.kf_ln_idx >= 0) & l_bad[l_safe], -1, ms.kf_ln_idx)
    return ms._replace(pt_valid=pt_valid, kf_pt_idx=kf_pt_idx,
                       ln_valid=ln_valid, kf_ln_idx=kf_ln_idx)


def create_points_from_depth(cam, ms: MapState, k, kp_depth, scale_factors,
                             max_depth: float = 40.0) -> MapState:
    """Create map points directly from per-keypoint depth (stereo / RGBD) —
    `Tracking::StereoInitialization` + the close-point creation in
    `CreateNewKeyFrame` (`src/Tracking.cc:1666`, depth-sorted insertion).

    Unbound keypoints of keyframe `k` with valid depth become landmarks with
    a single observation."""
    P = ms.pt_xyz.shape[0]
    T = ms.kf_T[k]
    T_wc = se3.se3_inv(T)
    uv = ms.kf_uv[k]
    rays = jnp.concatenate(
        [jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                    (uv[:, 1] - cam.cy) / cam.fy], -1),
         jnp.ones((uv.shape[0], 1))], -1)
    Xc = rays * kp_depth[:, None]
    Xw = se3.transform(T_wc, Xc)

    free = ms.kf_kp_valid[k] & (ms.kf_pt_idx[k] < 0)
    create = free & (kp_depth > 0.05) & (kp_depth < max_depth) & \
        jnp.all(jnp.isfinite(Xw), -1)

    slots, a, n_pt_new = mstate.append_slots(ms.n_pt, create, P)
    c_w = T_wc[:3, 3]
    d = jnp.linalg.norm(Xw - c_w, axis=-1)
    oct_k = ms.kf_octave[k]
    max_dist = d * scale_factors[oct_k]
    min_dist = max_dist / scale_factors[scale_factors.shape[0] - 1]
    normal = (Xw - c_w) / jnp.maximum(jnp.linalg.norm(Xw - c_w, axis=-1,
                                                      keepdims=True), 1e-6)
    ms = ms._replace(
        pt_xyz=ms.pt_xyz.at[slots].set(jnp.where(a[:, None], Xw, ms.pt_xyz[slots])),
        pt_desc=ms.pt_desc.at[slots].set(
            jnp.where(a[:, None], ms.kf_desc[k], ms.pt_desc[slots])),
        pt_normal=ms.pt_normal.at[slots].set(
            jnp.where(a[:, None], normal, ms.pt_normal[slots])),
        pt_min_dist=ms.pt_min_dist.at[slots].set(jnp.where(a, min_dist, ms.pt_min_dist[slots])),
        pt_max_dist=ms.pt_max_dist.at[slots].set(jnp.where(a, max_dist, ms.pt_max_dist[slots])),
        pt_valid=ms.pt_valid.at[slots].set(jnp.where(a, True, ms.pt_valid[slots])),
        pt_first_kf=ms.pt_first_kf.at[slots].set(jnp.where(a, k, ms.pt_first_kf[slots])),
        pt_n_obs=ms.pt_n_obs.at[slots].set(jnp.where(a, 1, ms.pt_n_obs[slots])),
        pt_desc_acc=ms.pt_desc_acc.at[slots].set(jnp.where(
            a[:, None], ms.kf_desc[k], ms.pt_desc_acc[slots])),
        pt_desc_cnt=ms.pt_desc_cnt.at[slots].set(
            jnp.where(a, 1, ms.pt_desc_cnt[slots])),
        pt_visible=ms.pt_visible.at[slots].set(jnp.where(a, 1, ms.pt_visible[slots])),
        pt_found=ms.pt_found.at[slots].set(jnp.where(a, 1, ms.pt_found[slots])),
        n_pt=n_pt_new,
    )
    pid = jnp.where(a, slots.astype(jnp.int32), -1)
    row = jnp.where(a, pid, ms.kf_pt_idx[k])
    return ms._replace(kf_pt_idx=ms.kf_pt_idx.at[k].set(row))


def cull_keyframes(ms: MapState, k_current, keep_recent: int = 3) -> MapState:
    """`KeyFrameCulling` (`src/LocalMapping.cc:1835`): a keyframe is
    redundant if >= 90% of its bound map points are observed by at least 3
    OTHER keyframes at the same or finer scale (`scaleLeveli <= scaleLevel
    + 1`, `:1870-1880`). KF0 and the most recent keyframes are protected.
    Culling releases the keyframe's observations (slot stays allocated —
    no pointer surgery, the spanning chain skips invalid slots)."""
    K = ms.kf_T.shape[0]
    P = ms.pt_xyz.shape[0]
    n_levels = 16  # octave values are < 16 for every config

    bound = (ms.kf_pt_idx >= 0) & ms.kf_kp_valid  # (K, N)
    pid = jnp.clip(ms.kf_pt_idx, 0, P - 1)

    # per-point observer count at octave <= t, for every threshold t:
    # bucket counts (n_levels, P) scattered once, then cumsum over t —
    # O(K*N) work instead of the (K, N, K) pairwise comparison
    oct_b = jnp.clip(ms.kf_octave, 0, n_levels - 1)
    flat_idx = (oct_b * P + pid).reshape(-1)
    valid_obs = (bound & ms.kf_valid[:, None]).reshape(-1)
    buckets = jnp.zeros((n_levels * P,), jnp.int32).at[flat_idx].add(
        valid_obs.astype(jnp.int32)).reshape(n_levels, P)
    cnt_le = jnp.cumsum(buckets, axis=0)          # (n_levels, P)

    # for each observation (k, n): #observers at octave <= own + 1,
    # minus self (self always qualifies for its own threshold)
    th = jnp.clip(oct_b + 1, 0, n_levels - 1)     # (K, N)
    cnt = cnt_le[th, pid] - 1                     # others at same-or-finer+1
    well_observed = (cnt >= 3) & bound
    n_bound = jnp.sum(bound, axis=1)
    n_redundant = jnp.sum(well_observed, axis=1)
    frac = n_redundant / jnp.maximum(n_bound, 1)

    ids = jnp.arange(K)
    protected = (ids == 0) | (ids > k_current - keep_recent)
    bad = ms.kf_valid & ~protected & (frac > 0.9) & (n_bound > 0)

    kf_valid = ms.kf_valid & ~bad
    kf_pt_idx = jnp.where(bad[:, None], -1, ms.kf_pt_idx)
    kf_ln_idx = jnp.where(bad[:, None], -1, ms.kf_ln_idx)
    ms = ms._replace(kf_valid=kf_valid, kf_pt_idx=kf_pt_idx,
                     kf_ln_idx=kf_ln_idx)
    inc = mstate.observers_of_points(ms)
    return ms._replace(pt_n_obs=jnp.sum(inc, axis=0).astype(jnp.int32))


def project_and_bind(cam, ms: MapState, kf, cand_mask, radius: float = 3.0,
                     max_hamming: int = 50) -> MapState:
    """Project candidate map points into keyframe `kf` and bind matching
    FREE keypoints as new observations — the observation-densification
    role of `ORBmatcher::Fuse` (`src/ORBmatcher.cc:914`) inside
    `SearchInNeighbors` (`src/LocalMapping.cc:1505`), with the reference's
    full gate set: scale-invariance distance range, viewing-angle cos >
    0.5, per-keypoint sigma-scaled radius, and descriptor threshold
    (`:940-1010`)."""
    P = ms.pt_xyz.shape[0]
    T = ms.kf_T[kf]
    Xc = se3.transform(T, ms.pt_xyz)
    z = Xc[:, 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    u = cam.fx * Xc[:, 0] * iz + cam.cx
    v = cam.fy * Xc[:, 1] * iz + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)

    # scale-invariance range + viewing angle (src/ORBmatcher.cc:946-976)
    T_wc = se3.se3_inv(T)
    c_w = T_wc[:3, 3]
    po = ms.pt_xyz - c_w
    dist = jnp.linalg.norm(po, axis=-1)
    in_range = (dist >= 0.8 * ms.pt_min_dist) & (dist <= 1.2 * ms.pt_max_dist)
    view_cos = jnp.sum(po * ms.pt_normal, axis=-1) / jnp.maximum(dist, 1e-6)
    vis = (cand_mask & ms.pt_valid & (z > 0) & in_img & in_range
           & (view_cos > 0.5))
    # skip points already observed by this keyframe — the reference's
    # `pMP->IsInKeyFrame(pKF)` skip in Fuse (`src/ORBmatcher.cc:938`);
    # without it a tracked point acquires a SECOND keypoint binding here
    already = jnp.zeros((P,), bool).at[
        jnp.clip(ms.kf_pt_idx[kf], 0, P - 1)].max(ms.kf_pt_idx[kf] >= 0)
    vis = vis & ~already

    # radius scaled by the keypoint's octave sigma (radius*scale^oct)
    kp_scale = jnp.power(1.2, ms.kf_octave[kf].astype(jnp.float32))
    r = radius * kp_scale[:, None]                 # (N, 1)
    du = jnp.abs(ms.kf_uv[kf][:, 0:1] - u[None, :])
    dv = jnp.abs(ms.kf_uv[kf][:, 1:2] - v[None, :])
    D = hamming.distance_matrix(ms.kf_desc[kf], ms.pt_desc)
    free = ms.kf_kp_valid[kf] & (ms.kf_pt_idx[kf] < 0) & ms.kf_valid[kf]
    mask = (du < r) & (dv < r) & vis[None, :] & free[:, None]
    idx, best, second = hamming.masked_best2(D, mask)
    bind = (best <= max_hamming) & (
        best.astype(jnp.float32) < 0.9 * second.astype(jnp.float32))
    # one keypoint per point (injectivity; hamming.dedup_by_target)
    bind = hamming.dedup_by_target(idx, bind, best, P)
    row = jnp.where(bind, idx.astype(jnp.int32), ms.kf_pt_idx[kf])
    ms = ms._replace(kf_pt_idx=ms.kf_pt_idx.at[kf].set(row))
    pid = jnp.clip(row, 0, P - 1)
    return ms._replace(pt_n_obs=ms.pt_n_obs.at[pid].add(
        bind.astype(jnp.int32)))


def loop_fuse(cam, ms: MapState, kf, cand_mask, radius: float = 4.0,
              max_hamming: int = 50) -> MapState:
    """Loop-closure fusion with REPLACE semantics (`CorrectLoop` point
    fusion + `SearchAndFuse`, `src/LoopClosing.cc:529-535,587`): project
    loop-side landmarks (`cand_mask`) into keyframe `kf`; a keypoint
    already bound to a non-loop landmark has that landmark REPLACED by the
    matched loop point — every observation of the duplicate anywhere in the
    map is rebound (`MapPoint::Replace`, `src/MapPoint.cc:177`) and the
    duplicate is invalidated. This is what actually couples the two sides
    of a loop: without it the revisit keyframes keep observing their own
    duplicated landmarks and global BA relaxes the map straight back to the
    drifted configuration."""
    P = ms.pt_xyz.shape[0]
    T = ms.kf_T[kf]
    Xc = se3.transform(T, ms.pt_xyz)
    z = Xc[:, 2]
    iz = 1.0 / jnp.maximum(z, 1e-6)
    u = cam.fx * Xc[:, 0] * iz + cam.cx
    v = cam.fy * Xc[:, 1] * iz + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    T_wc = se3.se3_inv(T)
    c_w = T_wc[:3, 3]
    po = ms.pt_xyz - c_w
    dist = jnp.linalg.norm(po, axis=-1)
    in_range = (dist >= 0.8 * ms.pt_min_dist) & (dist <= 1.2 * ms.pt_max_dist)
    view_cos = jnp.sum(po * ms.pt_normal, axis=-1) / jnp.maximum(dist, 1e-6)
    vis = (cand_mask & ms.pt_valid & (z > 0) & in_img & in_range
           & (view_cos > 0.5))

    kp_scale = jnp.power(1.2, ms.kf_octave[kf].astype(jnp.float32))
    r = radius * kp_scale[:, None]
    du = jnp.abs(ms.kf_uv[kf][:, 0:1] - u[None, :])
    dv = jnp.abs(ms.kf_uv[kf][:, 1:2] - v[None, :])
    D = hamming.distance_matrix(ms.kf_desc[kf], ms.pt_desc)
    mask = (du < r) & (dv < r) & vis[None, :] & ms.kf_kp_valid[kf][:, None]
    mask = mask & ms.kf_valid[kf]
    idx, best, _ = hamming.masked_best2(D, mask)
    # mutual best over this keyframe's keypoints (replace is destructive;
    # be conservative about which pairs trigger it)
    Dm = jnp.where(mask, D, hamming.INVALID)
    rev = jnp.argmin(Dm, axis=0)
    N = ms.kf_uv.shape[1]
    bind = (best <= max_hamming) & (rev[idx] == jnp.arange(N))

    old = ms.kf_pt_idx[kf]
    oldc = jnp.clip(old, 0, P - 1)
    idx = idx.astype(jnp.int32)
    is_dup = bind & (old >= 0) & ~cand_mask[oldc] & (oldc != idx)
    is_new = bind & (old < 0)

    # landmark LUT: duplicate id -> loop point id (identity elsewhere);
    # the (P+1)-slot dump absorbs the non-replacing lanes
    lut = jnp.arange(P + 1, dtype=jnp.int32)
    lut = lut.at[jnp.where(is_dup, oldc, P)].set(
        jnp.where(is_dup, idx, P))
    lut = lut[:P]
    # rebind EVERY observation of replaced duplicates, map-wide
    all_idx = ms.kf_pt_idx
    mapped = jnp.where(all_idx >= 0, lut[jnp.clip(all_idx, 0, P - 1)],
                       all_idx)
    # plus fresh bindings for this keyframe's free slots
    row = jnp.where(is_new, idx, mapped[kf])
    kf_pt_idx = mapped.at[kf].set(row)

    # transfer observation counts to the kept point; kill the duplicate
    dump = P
    tgt = jnp.where(is_dup, idx, dump)
    n_obs1 = jnp.concatenate([ms.pt_n_obs, jnp.zeros((1,), jnp.int32)])
    n_obs1 = n_obs1.at[tgt].add(jnp.where(is_dup, ms.pt_n_obs[oldc], 0))
    n_obs1 = n_obs1.at[jnp.where(is_new, idx, dump)].add(
        is_new.astype(jnp.int32))
    valid1 = jnp.concatenate([ms.pt_valid, jnp.zeros((1,), bool)])
    valid1 = valid1.at[jnp.where(is_dup, oldc, dump)].set(False)
    return ms._replace(kf_pt_idx=kf_pt_idx, pt_n_obs=n_obs1[:P],
                       pt_valid=valid1[:P])


def dedup_kf_point_rows(cam, ms: MapState) -> MapState:
    """Remove duplicate same-point bindings within each keyframe.

    `fuse_duplicate_points` / `loop_fuse` rewire every observation of a
    merged landmark map-wide (`MapPoint::Replace`, `src/MapPoint.cc:177`);
    a keyframe that observed BOTH the duplicate and the kept landmark ends
    up with two keypoint rows bound to the same point id. The reference
    erases the match in that case (`MapPoint::Replace` calls
    `KeyFrame::EraseMapPointMatch` when the keyframe already observes the
    replacement, `src/MapPoint.cc:196-203`); keeping both feeds BA a
    same-keyframe residual at the WRONG pixel (the duplicate's keypoint
    vs the kept landmark's 3D position). Keep, per (keyframe, point), the
    row whose pixel best reprojects the kept landmark; free the rest.
    """
    K, N = ms.kf_pt_idx.shape
    P = ms.pt_xyz.shape[0]

    def one(rows, T, uv):
        pid = jnp.clip(rows, 0, P - 1)
        Xc = se3.transform(T, ms.pt_xyz[pid])
        z = jnp.maximum(Xc[:, 2], 1e-6)
        q = jnp.stack([cam.fx * Xc[:, 0] / z + cam.cx,
                       cam.fy * Xc[:, 1] / z + cam.cy], axis=-1)
        err = jnp.sum((q - uv) ** 2, axis=-1)
        tgt = jnp.where(rows >= 0, pid, P)        # unbound rows -> dump id
        order = jnp.lexsort((err, tgt))           # group by point, best first
        tgt_s = tgt[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]])
        keep_s = first | (tgt_s == P)
        keep = jnp.zeros((N,), bool).at[order].set(keep_s)
        return jnp.where(keep, rows, -1)

    return ms._replace(
        kf_pt_idx=jax.vmap(one)(ms.kf_pt_idx, ms.kf_T, ms.kf_uv))


def search_in_neighbors(cam, ms: MapState, k_new,
                        covis_targets: bool = False,
                        whole_map: bool = False,
                        n_targets: int = 10, n_hop2: int = 5,
                        n_reverse: int = 2) -> MapState:
    """`SearchInNeighbors` (`src/LocalMapping.cc:1505`) both directions:
    bind the covisible NEIGHBORHOOD's points into the NEW keyframe's free
    keypoint slots, and the new keyframe's points into its two predecessor
    keyframes — densifying the covisibility graph beyond what tracking
    inliers alone provide.

    The forward direction is scoped to the reference's target set — the
    `n_targets` best covisible keyframes plus each one's `n_hop2`-best
    2-hop extension (`src/LocalMapping.cc:1508-1540`) — NOT the whole
    map.  Whole-map fusion (the pre-round-4 behavior, kept behind
    `whole_map` for A/B) re-associates the current keyframe with
    long-lost landmarks by descriptor+projection alone at loop revisits,
    silently absorbing drift that the explicit loop-closing stage (Sim3 +
    essential graph + GBA) is supposed to measure and correct — measured
    on the box-circuit fixture: the revisit rebinds into the first-lap
    map, keyframe creation stops (c2 saturation), and no closure can
    fire.

    With `covis_targets`, the reverse direction targets the new
    keyframe's top-2 TRUE covisible keyframes (falling back to the
    predecessors when covisibility is weak); at revisits those are
    old-pass keyframes, not the two most recent."""
    K = ms.kf_T.shape[0]
    P = ms.pt_xyz.shape[0]
    if whole_map:
        fuse_pts = jnp.ones((P,), bool)
    else:
        ids = jnp.arange(K)
        row = mstate.covis_rows(ms, jnp.reshape(k_new, (1,)))[0]     # (K,)
        w = jnp.where(ms.kf_valid & (ids != k_new), row, -1)
        top_w, top_i = jax.lax.top_k(w, min(n_targets, K))
        t1_ok = top_w > 0
        rows2 = mstate.covis_rows(ms, top_i)                         # (n1, K)
        rows2 = jnp.where(t1_ok[:, None], rows2, -1)
        rows2 = jnp.where((ids[None, :] != k_new) & ms.kf_valid[None, :],
                          rows2, -1)
        nb_w, nb_i = jax.lax.top_k(rows2, min(n_hop2, K))            # (n1, n2)
        tmask = jnp.zeros((K,), bool).at[top_i].max(t1_ok)
        tmask = tmask.at[nb_i.reshape(-1)].max((nb_w > 0).reshape(-1))
        trows = jnp.where(tmask[:, None], ms.kf_pt_idx, -1)
        fuse_pts = jnp.zeros((P,), bool).at[
            jnp.clip(trows, 0, P - 1).reshape(-1)].max(
            (trows >= 0).reshape(-1))
    ms = project_and_bind(cam, ms, k_new, fuse_pts)
    # points bound in k_new -> into the previous two keyframes
    new_pts = jnp.zeros((P,), bool).at[
        jnp.clip(ms.kf_pt_idx[k_new], 0, P - 1)].max(
        ms.kf_pt_idx[k_new] >= 0)
    # The reference fuses the new keyframe's points into EVERY target
    # keyframe (`src/LocalMapping.cc:1552-1557`), not just two; n_reverse
    # widens the reverse direction toward that — the direct lever on
    # landmark observation incidence (pt_n_obs; VERDICT r4 item 7, the
    # reference's design incidence is ~6 observers/landmark vs our ~2.2).
    if covis_targets:
        row = mstate.covis_rows(ms, jnp.reshape(k_new, (1,)))[0]   # (K,)
        w = jnp.where(ms.kf_valid & (jnp.arange(K) != k_new), row, -1)
        _, top = jax.lax.top_k(w, min(n_reverse, K))
        for i in range(min(n_reverse, K)):
            kt = jnp.where(w[top[i]] >= 10, top[i],
                           jnp.clip(k_new - (i + 1), 0, K - 1))
            ms = project_and_bind(cam, ms, kt, new_pts)
    else:
        for back in range(1, n_reverse + 1):
            ms = project_and_bind(cam, ms, jnp.clip(k_new - back, 0, K - 1),
                                  new_pts)
    return ms


def fuse_duplicate_points(ms: MapState, n_recent: int = 1024,
                          max_dist3d: float = 0.05, max_hamming: int = 40
                          ) -> MapState:
    """Duplicate-landmark fusion — the role of `SearchInNeighbors` +
    `ORBmatcher::Fuse` (`src/LocalMapping.cc:1505`, `src/ORBmatcher.cc:914`):
    recently created points that coincide with an existing landmark (3D
    proximity + descriptor agreement) are merged into the better-observed
    one; keyframe bindings are rewired (`MapPoint::Replace` semantics,
    `src/MapPoint.cc:177`)."""
    P = ms.pt_xyz.shape[0]
    # recent slots: the last n_recent allocated (indices n_pt-n_recent..n_pt)
    start = jnp.maximum(ms.n_pt - n_recent, 0)
    r_ids = start + jnp.arange(n_recent)
    r_ids = jnp.clip(r_ids, 0, P - 1)
    r_valid = ms.pt_valid[r_ids]

    d3 = jnp.linalg.norm(ms.pt_xyz[r_ids][:, None, :] - ms.pt_xyz[None, :, :],
                         axis=-1)                       # (R, P)
    D = hamming.distance_matrix(ms.pt_desc[r_ids], ms.pt_desc)
    older = jnp.arange(P)[None, :] < r_ids[:, None]     # strictly older slots
    cand = (r_valid[:, None] & ms.pt_valid[None, :] & older
            & (d3 < max_dist3d) & (D <= max_hamming))
    target = jnp.argmax(cand, axis=1)                   # first older match
    has_dup = jnp.any(cand, axis=1)

    # replacement map: recent id -> target id (identity elsewhere)
    repl = jnp.arange(P)
    repl = repl.at[r_ids].set(jnp.where(has_dup, target, r_ids))

    pid = jnp.clip(ms.kf_pt_idx, 0, P - 1)
    new_idx = jnp.where(ms.kf_pt_idx >= 0, repl[pid], ms.kf_pt_idx)
    pt_valid = ms.pt_valid.at[r_ids].set(r_valid & ~has_dup)
    ms = ms._replace(kf_pt_idx=new_idx.astype(jnp.int32), pt_valid=pt_valid)
    inc = mstate.observers_of_points(ms)
    return ms._replace(pt_n_obs=jnp.sum(inc, axis=0).astype(jnp.int32))


def fuse_duplicate_lines(ms: MapState, n_recent: int = 256,
                         max_mid_dist: float = 0.1, angle_tol: float = 0.15,
                         max_hamming: int = 50) -> MapState:
    """Duplicate map-line fusion — the intended role of `LSDmatcher::Fuse`
    (`src/LSDmatcher.cpp:860-1002`; note the reference version compares
    line descriptors against the KF's POINT descriptors, `:966` — a real
    bug this rebuild fixes by matching line descriptors): recently created
    lines that coincide with an older one (midpoint proximity + direction
    agreement + descriptor agreement) are merged into it, keyframe bindings
    rewired (`MapLine::Replace` semantics, `src/MapLine.cpp:192`)."""
    Lc = ms.ln_valid.shape[0]
    start = jnp.maximum(ms.n_ln - n_recent, 0)
    r_ids = jnp.clip(start + jnp.arange(n_recent), 0, Lc - 1)
    r_valid = ms.ln_valid[r_ids]

    mid = 0.5 * (ms.ln_xyz[:, 0] + ms.ln_xyz[:, 1])      # (L, 3)
    dirs = ms.ln_xyz[:, 1] - ms.ln_xyz[:, 0]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-9)
    d_mid = jnp.linalg.norm(mid[r_ids][:, None, :] - mid[None, :, :], axis=-1)
    cos_d = jnp.abs(jnp.sum(dirs[r_ids][:, None, :] * dirs[None, :, :], -1))
    D = hamming.distance_matrix(ms.ln_desc[r_ids], ms.ln_desc)
    older = jnp.arange(Lc)[None, :] < r_ids[:, None]
    cand = (r_valid[:, None] & ms.ln_valid[None, :] & older
            & (d_mid < max_mid_dist) & (cos_d > jnp.cos(angle_tol))
            & (D <= max_hamming))
    target = jnp.argmax(cand, axis=1)
    has_dup = jnp.any(cand, axis=1)

    repl = jnp.arange(Lc)
    repl = repl.at[r_ids].set(jnp.where(has_dup, target, r_ids))
    lid = jnp.clip(ms.kf_ln_idx, 0, Lc - 1)
    new_idx = jnp.where(ms.kf_ln_idx >= 0, repl[lid], ms.kf_ln_idx)
    ln_valid = ms.ln_valid.at[r_ids].set(r_valid & ~has_dup)
    n_obs = jnp.zeros((Lc,), jnp.int32).at[
        jnp.clip(new_idx, 0, Lc - 1).reshape(-1)].add(
        (new_idx >= 0).reshape(-1).astype(jnp.int32))
    # a wider-baseline re-triangulation of the same physical line merges
    # into the older slot — let it UPGRADE that slot's conditioning (the
    # keyframe chain re-triangulates against 3 baselines per keyframe)
    ln_cond = ms.ln_cond.at[jnp.clip(target, 0, Lc - 1)].max(
        jnp.where(has_dup, ms.ln_cond[r_ids], 0.0))
    return ms._replace(kf_ln_idx=new_idx.astype(jnp.int32),
                       ln_valid=ln_valid, ln_n_obs=n_obs, ln_cond=ln_cond)


def process_keyframe(cam, ms: MapState, feats, lfeats, T, matched_pt,
                     matched_ln, frame_id, kp_depth, sigma2_levels,
                     scale_factors, window: int, p_ba: int, l_ba: int,
                     max_depth: float, do_kf_cull, use_depth,
                     desc_majority: bool = False, bf: float = 0.0,
                     tri_covis: bool = False,
                     tri_covis_k: int = 3,
                     sin_covis: bool = False,
                     sin_whole_map: bool = False,
                     sin_reverse_n: int = 2) -> MapState:
    """The whole keyframe chain as ONE program: insert -> triangulate new
    points (two baselines) -> triangulate new lines (three baselines) ->
    depth-based creation (stereo/RGBD) -> fuse duplicates -> local BA ->
    landmark culling -> (periodic) keyframe culling.

    Fusing matters: as separate jits each stage materializes a complete new
    MapState (tens of MB) at the program boundary; in one program XLA
    aliases the intermediates, and `donate_argnums` makes the update
    in-place in HBM.
    """
    k_new = ms.n_kf
    ms = insert_keyframe(cam, ms, feats, T, matched_pt, frame_id,
                         scale_factors, lfeats=lfeats, matched_ln=matched_ln,
                         desc_majority=desc_majority,
                         kp_depth=kp_depth if use_depth else None, bf=bf)
    # Triangulation pairs: deepest baseline first (its better-conditioned
    # points claim the keypoint slots; shallower pairs fill what remains),
    # each pair gated on baseline/medianDepth >= 0.01 inside
    # create_new_points. The reference iterates the 10-20 best covisible
    # neighbors (`LocalMapping.cc:329`); on a sequential trajectory the
    # {1,2,4,8}-back ladder spans the same baseline range at fixed cost.
    # With `tri_covis`, partners are instead the top-3 TRUE covisible
    # keyframes (ordered deepest-baseline-first), which follows the
    # reference at revisits where covisible != recent; each falls back to
    # its ladder slot when covisibility is too weak (< 10 shared points).
    if tri_covis:
        # top-`tri_covis_k` covisible partners, deepest baseline first;
        # slot i falls back to its recency-ladder rung when covisibility
        # is too weak (< 10 shared points). The ladder is geometric
        # (2, 4, 8, ... frames back) so k=3 reproduces the round-3
        # {8,4,2}-back ladder as the fallback skeleton.
        K_all = ms.kf_T.shape[0]
        row = mstate.covis_rows(ms, jnp.reshape(k_new, (1,)))[0]   # (K,)
        w = jnp.where(ms.kf_valid & (jnp.arange(K_all) != k_new), row, -1)
        _, top = jax.lax.top_k(w, tri_covis_k)
        c_new = se3.se3_inv(ms.kf_T[k_new])[:3, 3]
        cs = jax.vmap(lambda k: se3.se3_inv(ms.kf_T[k])[:3, 3])(top)
        base = jnp.linalg.norm(cs - c_new, axis=-1)
        base = jnp.where(w[top] >= 10, base, -1.0)
        order = jnp.argsort(-base)
        top = top[order]
        base = base[order]
        ladder = [2 ** (tri_covis_k - i) for i in range(tri_covis_k)]
        for i, back in enumerate(ladder):
            kr = jnp.where(base[i] > 0, top[i],
                           jnp.clip(k_new - back, 0))
            ms = jax.lax.cond(
                (kr < k_new) & (kr >= 0),
                lambda m, kr=kr: create_new_points(
                    cam, m, k_new, kr, sigma2_levels, scale_factors),
                lambda m, kr=kr: m, ms)
    else:
        for back in (8, 4, 2):
            ms = jax.lax.cond(
                k_new >= back,
                lambda m, b=back: create_new_points(
                    cam, m, k_new, k_new - b, sigma2_levels, scale_factors),
                lambda m, b=back: m, ms)
    ms = create_new_points(cam, ms, k_new, k_new - 1, sigma2_levels,
                           scale_factors)
    if lfeats is not None:
        for back in (1, 2, 3):
            # 3-view support (CreateNewMapLinesConstraint) when a third
            # keyframe exists; plain 2-view triangulation otherwise
            ms = jax.lax.cond(
                k_new >= back + 1,
                lambda m, b=back: create_new_lines(
                    cam, m, k_new, k_new - b,
                    k_third=jnp.clip(k_new - b - 1, 0)),
                lambda m, b=back: jax.lax.cond(
                    k_new >= b,
                    lambda mm: create_new_lines(cam, mm, k_new, k_new - b),
                    lambda mm: mm, m),
                ms)
        ms = fuse_duplicate_lines(ms)
    if use_depth:
        ms = create_points_from_depth(cam, ms, k_new, kp_depth,
                                      scale_factors, max_depth)
    ms = fuse_duplicate_points(ms)
    ms = search_in_neighbors(cam, ms, k_new,
                             covis_targets=sin_covis,
                             whole_map=sin_whole_map,
                             n_reverse=sin_reverse_n)
    # Replace-rewiring above can leave a keyframe with two rows bound to
    # the same landmark (one at the wrong pixel); erase the worse row
    # before BA consumes the observations, then refresh counts.
    ms = dedup_kf_point_rows(cam, ms)
    inc = mstate.observers_of_points(ms)
    ms = ms._replace(pt_n_obs=jnp.sum(inc, axis=0).astype(jnp.int32))
    # 4+8 iterations: the reference schedules 5+10 but aborts BA whenever a
    # new keyframe arrives (mbAbortBA, src/LocalMapping.cc:140) — effective
    # iteration counts under load are lower than nominal
    ms = run_local_ba(cam, ms, sigma2_levels, window=window, p_ba=p_ba,
                      l_ba=l_ba, iters_a=4, iters_b=8,
                      use_stereo=bool(use_depth) and bf > 0, bf=bf)
    ms = cull_points(ms, k_new)
    ms = jax.lax.cond(do_kf_cull, lambda m: cull_keyframes(m, k_new),
                      lambda m: m, ms)
    return ms
