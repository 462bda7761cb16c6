"""Explicit loop closure under the DEFAULT config (VERDICT r4 item 4).

`tests/test_loop_closure_e2e.py` pins `tri_covis=False` because on the
110-frame circuit the default covisible-triangulation policy absorbs the
drift through data association and no explicit closure fires. This fixture
is the longer circuit (160 frames, amplitude 2.0, 2.4% fx bias) where the
DEFAULT config still accumulates enough drift that the explicit
detect -> Sim3 -> essential-graph -> async-GBA stack must fire.

Fixture calibration: scripts/default_loop_fixture_probe.py — closure
(29, 2), 30 KFs, pre-closure kf ATE ~0.090, post-GBA ~0.016.

Runtime ~5-8 min on the CPU test backend -> slow-marked; the wiring-level
loop pieces stay covered by test_loop_components.py in the default suite.
"""
import numpy as np
import pytest

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig


@pytest.mark.slow
def test_default_config_explicit_loop_closure():
    n = 160
    scene = synthetic.make_scene(seed=7, layout="box")
    Ts_gt = synthetic.trajectory(n, "circle", amplitude=2.0)
    frames = [synthetic.render(scene, T) for T in Ts_gt]

    # NOTE: no tri_covis / sel_* / guard overrides — the point of this test
    # is that the SHIPPED defaults detect and correct the loop
    cfg = SLAMConfig(fx=512.0, fy=512.0, cx=320.0, cy=240.0,  # 2.4% fx bias
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3,
                     max_kf=64, max_pt=8192, max_ln=256, n_lf=64,
                     ba_window=5, ba_points=1536,
                     kf_max_interval=3, kf_min_interval=2,
                     use_loop_closing=True, grow_map=True)
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()  # drains the in-flight async GBA

    lc = slam.loop_closer
    assert lc.n_loops >= 1, "no explicit loop closure fired (default cfg)"
    k, c = lc.last_closure
    assert k - c >= 15, f"closure ({k},{c}) is not a long-range loop"
    assert slam.n_gba_done >= 1, "async global BA never completed"

    n_kf = slam.n_kf_host
    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf]
    gt = Ts_gt[fid]
    n_pre = min(k + 1, n_kf)
    ate_pre = synthetic.ate_rmse(lc.pre_correction_kf_T[:n_pre], gt[:n_pre])
    # the full corrected map (essential graph + fuse + async GBA) must
    # clearly beat the pre-closure snapshot over the same keyframes
    ate_final = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_pre],
                                   gt[:n_pre])
    assert ate_final < 0.7 * ate_pre, (ate_pre, ate_final)
