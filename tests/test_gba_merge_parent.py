"""Spanning-tree parent-walk GBA merge (VERDICT r2 #7).

Keyframes created while a global BA is in flight must be corrected through
their SPANNING-TREE PARENT (earlier keyframe with max shared observations,
`src/LoopClosing.cc:678-738` + `src/KeyFrame.cc:408-413`), not through the
BA window's tip: a keyframe that relocalized into an OLD map region mid-GBA
chains off that region, and the tip's correction is the wrong transform.
"""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.geometry import se3
from plslam_tpu.mapstate import state as mstate
from plslam_tpu.models import mapping
from plslam_tpu.optim.local_ba import BAResult


def _se3(rx=0.0, tx=0.0, ty=0.0):
    xi = jnp.asarray([0.0, 0.0, rx, tx, ty, 0.0], jnp.float32)
    return np.asarray(se3.se3_exp(xi))


def test_gba_merge_corrects_through_parent_not_tip():
    cfg = mstate.MapConfig(max_kf=8, max_pt=256, max_ln=4, n_kp=64, n_lf=4,
                           n_levels=2)
    N = cfg.n_kp
    ms = mstate.allocate(cfg)
    K = cfg.max_kf

    # 4 pre-BA keyframes along x; distinctive binding layout:
    #   points 0..19  observed ONLY by keyframe 1
    #   points 20..39 observed by keyframes 0..3 (the shared backbone)
    kf_T = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    for k in range(4):
        kf_T[k] = _se3(tx=-0.2 * k)
    kf_pt_idx = np.full((K, N), -1, np.int32)
    for k in range(4):
        kf_pt_idx[k, :20] = np.arange(20, 40)
    kf_pt_idx[1, 20:40] = np.arange(0, 20)

    pts = np.zeros((cfg.max_pt, 3), np.float32)
    pts[:40, 2] = 5.0
    ms_old = ms._replace(
        kf_T=jnp.asarray(kf_T),
        kf_valid=jnp.asarray(np.arange(K) < 4),
        kf_pt_idx=jnp.asarray(kf_pt_idx),
        kf_kp_valid=jnp.asarray(np.broadcast_to(
            (np.arange(K) < 4)[:, None], (K, N)).copy()),
        pt_xyz=jnp.asarray(pts),
        pt_valid=jnp.asarray(np.arange(cfg.max_pt) < 40),
        n_kf=jnp.int32(4), n_pt=jnp.int32(40),
    )
    kf_T_old = ms_old.kf_T

    # keyframe 4 born during the BA, kidnap-relocalized next to keyframe 1:
    # it observes ONLY keyframe 1's private points -> spanning-tree parent 1
    kf_pt_idx5 = kf_pt_idx.copy()
    kf_pt_idx5[4, :20] = np.arange(0, 20)
    kf_T5 = kf_T.copy()
    kf_T5[4] = _se3(tx=-0.2, ty=0.05)
    ms_new = ms_old._replace(
        kf_T=jnp.asarray(kf_T5),
        kf_valid=jnp.asarray(np.arange(K) < 5),
        kf_pt_idx=jnp.asarray(kf_pt_idx5),
        kf_kp_valid=jnp.asarray(np.broadcast_to(
            (np.arange(K) < 5)[:, None], (K, N)).copy()),
        n_kf=jnp.int32(5),
    )

    # BA selection over the old map; fake a converged result whose
    # correction DIFFERS between keyframe 1 and the tip (keyframe 3)
    s2 = jnp.asarray([1.0, 1.44])
    s = mapping.ba_select(ms_old, s2, window=8, p_ba=64, l_ba=4)
    ids_c = np.asarray(s.ids_c)
    deltas = {1: _se3(tx=0.10), 3: _se3(rx=0.2, tx=-0.30)}
    res_T = np.asarray(ms_old.kf_T)[ids_c].copy()
    for j, gid in enumerate(ids_c):
        if int(gid) in deltas and bool(np.asarray(s.kf_mask)[j]):
            res_T[j] = res_T[j] @ deltas[int(gid)]
    res = BAResult(
        kf_T=jnp.asarray(res_T),
        pt_xyz=s.prob.pt_xyz, ln_xyz=s.prob.ln_xyz,
        obs_inlier=s.prob.obs_mask, ln_obs_inlier=s.prob.ln_obs_mask,
        cost=jnp.float32(0.0))

    merged = mapping.gba_merge(ms_new, s, res, kf_T_old, jnp.int32(4))

    T4 = np.asarray(merged.kf_T[4])
    T1_old = kf_T[1]
    T1_new = np.asarray(merged.kf_T[1])
    # relative pose to the CORRECTED parent (keyframe 1) preserved
    want = kf_T5[4] @ np.linalg.inv(T1_old) @ T1_new
    np.testing.assert_allclose(T4, want, atol=1e-5)
    # and the tip anchor would have given a different answer
    T3_new = np.asarray(merged.kf_T[3])
    tip = kf_T5[4] @ np.linalg.inv(kf_T[3]) @ T3_new
    assert np.abs(T4 - tip).max() > 1e-3, "fixture does not discriminate"
    # pre-BA window poses took the BA values
    np.testing.assert_allclose(T1_new, kf_T[1] @ deltas[1], atol=1e-5)
