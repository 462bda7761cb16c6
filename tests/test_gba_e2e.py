"""Global BA end-to-end: calibration-induced drift must shrink when the
full-map BA runs (the RunGlobalBundleAdjustment contract, in-situ)."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
import pytest


@pytest.mark.slow
def test_global_ba_reduces_drift():
    n = 72
    scene = synthetic.make_scene(seed=4)
    Ts_gt = synthetic.trajectory(n, "loop", amplitude=1.6)
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    # 2% focal-length error -> systematic map drift
    cfg = SLAMConfig(fx=510.0, fy=510.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3, max_kf=28, max_pt=6144,
                     ba_window=5, ba_points=1536, kf_max_interval=4,
                     kf_ref_ratio=2.0,  # always-weak c2: fixed cadence
                     kf_min_interval=4,  # sparse fixed cadence lets the 2%
                     # focal error accumulate into measurable drift
                     level_map=0,  # fixture pin: the naive uv*scale^l
                     # mapping's per-octave tilt adds to the focal error,
                     # producing drift well above the run-to-run noise
                     # floor so the 0.6x GBA-improvement assert has power.
                     # Under the default (ratio) mapping this fixture's
                     # drift shrinks to ~0.025 and GBA's relative gain
                     # (0.025 -> 0.0196 measured) falls inside the noise.
                     tri_covis=False,  # fixture pin (round 4): covisible
                     # triangulation partners cut this fixture's drift to
                     # 0.0266 with GBA gain 0.74x — inside noise again.
                     # The recency ladder preserves the drift this test's
                     # GBA-mechanism assert needs.
                     use_loop_closing=True)
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    n_kf = slam.n_kf_host
    assert n_kf >= 6

    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf]
    gt_kf = Ts_gt[fid]
    ate_before = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_kf], gt_kf)
    slam.run_global_ba()
    ate_after = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_kf], gt_kf)
    assert ate_before > 0.02, f"no drift accumulated ({ate_before})"
    assert ate_after < 0.6 * ate_before, (ate_before, ate_after)
