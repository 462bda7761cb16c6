"""End-to-end SLAM test on a rendered synthetic sequence (SURVEY §4 test
pyramid item 4: trajectory vs exact ground truth)."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
import pytest


@pytest.mark.slow
def test_synthetic_sequence_ate():
    n_frames = 28
    scene = synthetic.make_scene(seed=1)
    Ts_gt = synthetic.trajectory(n_frames, "orbit", amplitude=1.2)
    frames = [synthetic.render(scene, T) for T in Ts_gt]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=512, n_levels=3,
        max_kf=16, max_pt=4096, ba_window=5, ba_points=1024,
        kf_max_interval=5,
    )
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)

    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n_frames) if (i / 30.0) in est]
    assert len(idx) >= n_frames - 6, f"only {len(idx)} frames tracked"
    T_est = np.stack([est[i / 30.0] for i in idx])
    ate = synthetic.ate_rmse(T_est, Ts_gt[idx])
    span = np.linalg.norm(
        (-Ts_gt[idx[-1]][:3, :3].T @ Ts_gt[idx[-1]][:3, 3])
        - (-Ts_gt[idx[0]][:3, :3].T @ Ts_gt[idx[0]][:3, 3]))
    assert ate < 0.05 * max(span, 0.2), f"ATE {ate:.3f} m over span {span:.2f} m"
    assert slam.n_keyframes() >= 3
    assert slam.n_map_points() > 150

    # trajectory export must produce valid TUM lines
    import io, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "traj.txt")
        slam.save_trajectory_tum(p)
        lines = open(p).read().strip().splitlines()
        assert len(lines) == len(slam.trajectory)
        assert all(len(l.split()) == 8 for l in lines)
