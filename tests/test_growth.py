"""Dynamic map capacity: double-and-pad growth (SURVEY §7 hard part 5).

The reference's map grows unboundedly (`src/Map.cc`, heap KeyFrames); the
TPU rebuild grows by re-padding the SoA arrays. These tests assert (a) the
grow primitive preserves every live landmark/keyframe bit-exactly, and
(b) a System run that exceeds its initial capacities keeps mapping instead
of silently dropping landmarks (the round-1 behavior)."""
import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.mapstate import state as mstate
from plslam_tpu.models.system import System, SLAMConfig
import pytest


@pytest.mark.slow
def test_grow_preserves_contents():
    cfg = mstate.MapConfig(max_kf=4, max_pt=64, max_ln=8, n_kp=32, n_lf=4,
                           n_levels=2)
    ms = mstate.allocate(cfg)
    rng = np.random.default_rng(0)
    ms = ms._replace(
        pt_xyz=jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)),
        pt_valid=jnp.asarray(rng.random(64) < 0.5),
        kf_pt_idx=jnp.asarray(rng.integers(-1, 64, (4, 32)).astype(np.int32)),
        kf_valid=jnp.asarray([True, True, False, False]),
        n_kf=jnp.int32(2), n_pt=jnp.int32(40), n_ln=jnp.int32(0),
    )
    big = mstate.MapConfig(max_kf=8, max_pt=128, max_ln=16, n_kp=32, n_lf=4,
                           n_levels=2)
    ms2 = mstate.grow_jit(ms, big)
    assert ms2.pt_xyz.shape == (128, 3)
    assert ms2.kf_pt_idx.shape == (8, 32)
    np.testing.assert_array_equal(np.asarray(ms2.pt_xyz[:64]),
                                  np.asarray(ms.pt_xyz))
    np.testing.assert_array_equal(np.asarray(ms2.kf_pt_idx[:4]),
                                  np.asarray(ms.kf_pt_idx))
    np.testing.assert_array_equal(np.asarray(ms2.pt_valid[:64]),
                                  np.asarray(ms.pt_valid))
    # padding is inert: invalid points, -1 bindings, identity poses
    assert not np.asarray(ms2.pt_valid[64:]).any()
    assert (np.asarray(ms2.kf_pt_idx[4:]) == -1).all()
    np.testing.assert_array_equal(np.asarray(ms2.kf_T[6]), np.eye(4))
    assert int(ms2.n_pt) == 40 and int(ms2.n_kf) == 2
    # line-equation padding keeps the far-away sentinel
    assert float(ms2.kf_ln_l2d[5, 0, 2]) < -1e8


@pytest.mark.slow
def test_system_grows_past_initial_capacity():
    n = 48
    scene = synthetic.make_scene(seed=2)
    Ts_gt = synthetic.trajectory(n, "orbit")
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3,
                     max_kf=6, max_pt=1024, max_ln=64,   # tiny initial caps
                     ba_window=4, ba_points=1024,
                     kf_max_interval=3, kf_min_interval=3,
                     kf_ref_ratio=2.0,  # always-weak c2 + min-interval 3:
                     # fixed every-3-frames cadence to bust the tiny caps
                     # (the strict reference c2 gate makes KFs demand-driven)
                     use_loop_closing=False)
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    assert slam.n_growths >= 2, "expected keyframe + point capacity growth"
    assert slam.map_cfg.max_kf > 6
    # the run kept making keyframes past the original cap
    assert slam.n_kf_host > 6
    assert slam.n_map_points() > 0
    # map still consistent: every binding points at a valid-or-culled slot
    ms = slam.ms
    P = ms.pt_xyz.shape[0]
    assert (np.asarray(ms.kf_pt_idx) < P).all()
    # trajectory remained tracked to the end (no LOST tail)
    assert not slam.stats[-1]["lost"]
