"""Catastrophic-jump guard (VERDICT r4 item 5, models/tracking.py).

The measured collapse mode of the r4 campaign: one frame's aliased matches
pull the pose optimum to an implausible pose, the garbage pose then seeds
keyframes/triangulation before the host sees the inlier count. The guard
rejects a pose update whose single-frame SE3 step exceeds the config caps:
the frame coasts on the constant-velocity prediction, binds nothing, and
reports 0 inliers.

Both gate arms are exercised against the SAME real map + features: default
caps accept (inliers > 0, pose moves), near-zero caps reject (0 inliers,
pose == prediction, velocity decayed not adopted).
"""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.geometry import se3
from plslam_tpu.models import tracking
from plslam_tpu.models.system import System, SLAMConfig


def _built_slam():
    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=384, n_levels=3, max_kf=8, max_pt=2048,
        n_lf=32, ba_window=3, ba_points=512, ba_lines=32,
        kf_max_interval=5, use_loop_closing=False, grow_map=False,
        min_init_matches=60)
    scene = synthetic.make_scene(seed=7)
    Ts = synthetic.trajectory(14, "orbit", amplitude=1.0)
    frames = [np.asarray(synthetic.render(scene, T)).astype(np.uint8)
              for T in Ts]
    slam = System(cfg)
    i = 0
    while slam.state != "OK" and i < 8:
        slam.track_monocular(frames[i], i / 30.0)
        i += 1
    assert slam.state == "OK"
    for j in range(i, i + 4):
        slam.track_monocular(frames[j % len(frames)], j / 30.0)
    slam.flush()
    return slam, frames, i + 4


def test_jump_guard_accept_and_reject():
    slam, frames, k = _built_slam()
    feats, lfeats = slam._extract(jnp.asarray(frames[k % len(frames)]))
    cam = slam.cam
    # perturb T_last so the optimizer must move the pose a measurable step
    T_start = np.asarray(
        se3.se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, 0.0, 0.0]))
        @ slam.T_last)
    common = dict(scale_factors=slam.scale_factors,
                  sigma2_levels=slam.sigma2,
                  n_levels=slam.cfg.n_levels, scale=slam.cfg.scale_factor,
                  velocity=jnp.eye(4))

    res_ok = tracking.track_local_map(
        cam, slam.ms, feats, jnp.asarray(T_start), lfeats=lfeats, **common)
    assert int(res_ok.n_inliers) > 20, "fixture must track under default caps"
    moved = np.linalg.norm(np.asarray(res_ok.T)[:3, 3] - T_start[:3, 3])
    assert moved > 1e-6, "optimizer must actually move the pose"

    res_rej = tracking.track_local_map(
        cam, slam.ms, feats, jnp.asarray(T_start), lfeats=lfeats,
        max_step_t=1e-9, max_step_r=1e-9, **common)
    # rejected: coast on prediction (velocity=I -> T_pred == T_start),
    # report nothing, bind nothing
    assert int(res_rej.n_inliers) == 0
    assert int(res_rej.n_ln_inliers) == 0
    assert np.allclose(np.asarray(res_rej.T), T_start, atol=1e-6)
    assert int((np.asarray(res_rej.matched_pt) >= 0).sum()) == 0
    # velocity decays the previous velocity (identity stays identity)
    # instead of adopting the rejected jump
    assert np.allclose(np.asarray(res_rej.velocity), np.eye(4), atol=1e-6)
