"""Explicit loop closure end-to-end (VERDICT round-1 item 4): a full
360-degree circuit inside a 4-wall box with a ~2.4% focal-length error.
Covisibility breaks mid-circuit (opposite headings share no walls), drift
accumulates, and the revisit at the end must fire the whole stack —
BoW detection + 3-consecutive consistency + Sim3 RANSAC/refine +
essential-graph correction + SearchAndFuse + async global BA.

This test FAILS if loop closing is disabled (n_loops == 0) and fails if
the correction does not improve keyframe accuracy over the pre-closure
snapshot. Runtime: ~10-15 min on the CPU test backend (it is the
round-trip integration proof; the unit pieces are covered by
test_loop_components.py).

Fixture calibration measured via scripts/loop_probe.py: closure at
k approx 38 vs KF 0 with approx 30 BoW matches / approx 23 Sim3 inliers.
"""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
import pytest


@pytest.mark.slow
def test_circuit_loop_closure_fires_and_corrects():
    n = 110
    scene = synthetic.make_scene(seed=7, layout="box")
    Ts_gt = synthetic.trajectory(n, "circle", amplitude=2.0)
    frames = [synthetic.render(scene, T) for T in Ts_gt]

    cfg = SLAMConfig(fx=512.0, fy=512.0, cx=320.0, cy=240.0,  # 2.4% fx error
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3,
                     max_kf=40, max_pt=8192, max_ln=256, n_lf=64,
                     ba_window=5, ba_points=1536,
                     kf_max_interval=3, kf_min_interval=2,
                     desc_pattern="gauss",  # fixture pin (round 5): the
                     # learned pattern is photo-texture-tuned and starves
                     # on this blob-textured box (BASELINE.md round-5);
                     # this test exercises the explicit loop STACK on a
                     # deterministic fixture, so the detector config is
                     # pinned alongside tri_covis below. The shipped
                     # defaults' loop duty lives in
                     # test_loop_closure_default_cfg.py (photo room).
                     tri_covis=False,  # fixture pin (round 4): top-k
                     # covisible triangulation partners rebind the revisit
                     # into the first-pass map through the covisibility
                     # graph, so drift is absorbed by data association and
                     # no EXPLICIT closure fires — this test exists to
                     # exercise the explicit detect->Sim3->essential-graph
                     # ->GBA stack, which needs decoupled passes
                     use_loop_closing=True, grow_map=True)
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()  # also drains the in-flight async GBA

    lc = slam.loop_closer
    assert lc.n_loops >= 1, "no explicit loop closure fired on a circuit"
    k, c = lc.last_closure
    assert k - c >= 15, f"closure ({k},{c}) is not a long-range loop"
    assert slam.n_gba_done >= 1, "async global BA never completed"

    # The essential-graph correction must IMPROVE keyframe accuracy
    # (compare over the keyframes that existed AT the closure — later slots
    # in the snapshots are unwritten identity poses).
    n_kf = slam.n_kf_host
    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf]
    gt = Ts_gt[fid]
    n_pre = min(k + 1, n_kf)
    ate_pre = synthetic.ate_rmse(lc.pre_correction_kf_T[:n_pre], gt[:n_pre])
    ate_corr = synthetic.ate_rmse(lc.post_correction_kf_T[:n_pre],
                                  gt[:n_pre])
    assert ate_corr < ate_pre, (ate_pre, ate_corr)

    # ...and the post-GBA map must also beat the pre-closure one (the
    # replace-semantics fuse + obs-ranked GBA selection provide the
    # cross-loop coupling; measured margin ~2x on this fixture:
    # 0.105 -> 0.058, scripts/loop_debug.py)
    ate_final = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_pre],
                                   gt[:n_pre])
    assert ate_final < ate_pre, (ate_pre, ate_final)

    # exported trajectory is retro-corrected through the relative-pose log
    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n) if (i / 30.0) in est]
    ate_traj = synthetic.ate_rmse(np.stack([est[i / 30.0] for i in idx]),
                                  Ts_gt[idx])
    assert ate_traj < 1.5 * ate_final + 0.05
