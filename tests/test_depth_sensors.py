"""RGB-D and stereo input paths (`System::TrackRGBD` / `TrackStereo`
equivalents): single-frame metric initialization, depth-based landmark
creation, metric-scale trajectory (no Sim3 scale alignment needed)."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.geometry import se3
from plslam_tpu.models.system import System, SLAMConfig
from plslam_tpu.utils import metrics


def _cfg(**kw):
    base = dict(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                k1=0, k2=0, p1=0, p2=0, k3=0,
                n_features=512, n_levels=3,
                max_kf=12, max_pt=4096, ba_window=4, ba_points=1024,
                kf_max_interval=5, use_loop_closing=False)
    base.update(kw)
    return SLAMConfig(**base)


def test_rgbd_tracking_metric():
    n_frames = 18
    scene = synthetic.make_scene(seed=5)
    Ts_gt = synthetic.trajectory(n_frames, "orbit", amplitude=1.0)
    slam = System(_cfg())
    for i, T in enumerate(Ts_gt):
        img, depth = synthetic.render_rgbd(scene, T)
        slam.track_rgbd(img, depth, i / 30.0)
    slam.flush()
    assert slam.state == "OK"
    assert slam.n_map_points() > 200
    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n_frames) if (i / 30.0) in est]
    assert len(idx) == n_frames  # depth init is instant: every frame tracked
    T_est = np.stack([np.asarray(est[i / 30.0]) for i in idx])
    # METRIC ATE: no scale alignment — depth fixes the scale
    ate = metrics.ate_rmse(T_est, Ts_gt[idx], with_scale=False)
    assert ate < 0.03, f"metric ATE {ate:.3f} m"


def test_stereo_tracking_metric():
    n_frames = 14
    scene = synthetic.make_scene(seed=6)
    Ts_gt = synthetic.trajectory(n_frames, "orbit", amplitude=0.8)
    baseline = 0.3  # disparity resolution scales with baseline (KITTI: 0.54)
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline  # right camera: world point appears shifted left
    slam = System(_cfg(baseline=baseline, th_depth=35 * baseline))
    for i, T in enumerate(Ts_gt):
        img_l = synthetic.render(scene, T)
        img_r = synthetic.render(scene, T_rl @ T)
        slam.track_stereo(img_l, img_r, i / 30.0)
    slam.flush()
    assert slam.state == "OK"
    assert slam.n_map_points() > 150
    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n_frames) if (i / 30.0) in est]
    assert len(idx) == n_frames
    T_est = np.stack([np.asarray(est[i / 30.0]) for i in idx])
    ate = metrics.ate_rmse(T_est, Ts_gt[idx], with_scale=False)
    # stereo depth has a biased far-tail (median err 0.9%, p90 ~5%) — the
    # round-2 lever is depth-dependent information weighting in BA
    assert ate < 0.10, f"metric ATE {ate:.3f} m"
