"""Relocalization end-to-end: kidnap the tracker mid-sequence and verify it
recovers via the global-match + RANSAC-PnP path (`Tracking::Relocalization`
behavior, SURVEY §5 failure recovery)."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
import pytest


@pytest.mark.slow
def test_kidnap_recovery():
    n_frames = 30
    scene = synthetic.make_scene(seed=2)
    Ts_gt = synthetic.trajectory(n_frames, "orbit", amplitude=1.0)
    frames = [synthetic.render(scene, T) for T in Ts_gt]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=512, n_levels=3,
        max_kf=16, max_pt=4096, ba_window=5, ba_points=1024,
        # dense cadence: the map must be past the young-map auto-reset
        # threshold (<= 5 KFs => Reset instead of Relocalization,
        # src/Tracking.cc:563-571) before the kidnap
        kf_max_interval=2, kf_min_interval=1, use_loop_closing=False,
        kf_ref_ratio=2.0,  # always-weak c2: force dense keyframing
    )
    slam = System(cfg)
    for i in range(20):
        slam.track_monocular(frames[i], i / 30.0)
    slam.flush()
    assert slam.state == "OK"
    assert slam.n_kf_host > 5, "fixture must outgrow the auto-reset gate"

    # kidnap: wreck the motion state so the next prediction is garbage
    slam.velocity = jnp.asarray(np.diag([1.0, 1, 1, 1]).astype(np.float32))
    from plslam_tpu.geometry import se3
    slam.T_last = se3.se3_exp(jnp.asarray(
        np.array([1.5, -0.8, 2.0, 5.0, 4.0, -6.0], np.float32)))

    recovered = False
    for i in range(20, n_frames):
        T = slam.track_monocular(frames[i], i / 30.0)
        if slam.stats and slam.stats[-1].get("reloc"):
            recovered = True
    assert recovered, "relocalization never fired"
    assert slam.state == "OK"
    # post-recovery pose must be consistent with ground truth (up to Sim3)
    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n_frames) if (i / 30.0) in est and i >= 22]
    T_est = np.stack([est[i / 30.0] for i in idx])
    ate = synthetic.ate_rmse(T_est, Ts_gt[idx])
    assert ate < 0.1, f"post-recovery ATE {ate}"
