"""Numeric-sanitizer pass over the core solvers (SURVEY §4 / VERDICT r4
item 9): run the optimization and geometry kernels under
`jax_debug_nans` so any NaN produced inside a jitted program fails
loudly here instead of silently corrupting a map mid-sequence.

The reference has no sanitizers at all (SURVEY §5 "race detection:
none"); the functional rebuild removes data races by construction, and
this tier covers the remaining class — numeric poisoning (0/0, inf-inf)
inside masked/padded arithmetic, which plain value assertions miss when
the poisoned lanes are masked out downstream.

Kept unit-tier small (seconds, not minutes): synthetic inputs, tiny
shapes — the point is NaN-freedom of the code paths, not accuracy.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture
def nan_guard():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def _cam():
    from plslam_tpu.geometry.camera import Camera
    return Camera(500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0, 0, 640, 480)


def test_pose_optimize_nan_free(nan_guard):
    from plslam_tpu.optim import pose_opt
    rng = np.random.default_rng(3)
    cam = _cam()
    P = 64
    X = rng.uniform([-2, -2, 2], [2, 2, 6], (P, 3)).astype(np.float32)
    uv = (X[:, :2] / X[:, 2:3]) * 500.0 + np.array([320.0, 240.0])
    uv = uv + rng.normal(0, 0.5, uv.shape)
    # half the slots masked out (padding discipline) + a poisoned slot:
    # masked-out rows must not leak NaN into the update
    mask = np.arange(P) < P // 2
    X[-1] = [0.0, 0.0, 0.0]   # degenerate point in a MASKED slot
    obs = pose_opt.PoseObs(jnp.asarray(X), jnp.asarray(uv, jnp.float32),
                           jnp.ones((P,), jnp.float32), jnp.asarray(mask),
                           *pose_opt.PoseObs.empty_lines(1))
    res = pose_opt.pose_optimize(cam, jnp.eye(4), obs, rounds=2,
                                 iters_per_round=5)
    assert np.isfinite(np.asarray(res.T)).all()
    assert int(res.n_inliers) > 20


def test_se3_sim3_roundtrip_nan_free(nan_guard):
    from plslam_tpu.geometry import se3, sim3
    rng = np.random.default_rng(5)
    xi = jnp.asarray(rng.normal(0, 0.4, (16, 6)).astype(np.float32))
    T = se3.se3_exp(xi)
    back = se3.se3_log(T)
    assert np.isfinite(np.asarray(back)).all()
    # identity and near-pi rotations are the classic NaN corners
    eye = se3.se3_log(jnp.eye(4))
    assert np.isfinite(np.asarray(eye)).all()
    s = jnp.asarray(rng.normal(0, 0.3, (8, 7)).astype(np.float32))
    S = sim3.expmap(s)
    back2 = sim3.logmap(S)
    for leaf in jax.tree_util.tree_leaves(back2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_two_view_init_nan_free(nan_guard):
    from plslam_tpu.solvers import twoview
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.ops import extract, hamming
    scene = synthetic.make_scene(seed=3)
    Ts = synthetic.trajectory(8, "orbit", amplitude=1.2)
    cfg = extract.ExtractorConfig(n_features=256, n_levels=2)
    f1 = extract.extract_points(jnp.asarray(
        synthetic.render(scene, Ts[0]), jnp.float32), cfg)
    f2 = extract.extract_points(jnp.asarray(
        synthetic.render(scene, Ts[6]), jnp.float32), cfg)
    D = hamming.distance_matrix(f1.desc, f2.desc)
    mask = f1.valid[:, None] & f2.valid[None, :]
    idx, best, second = hamming.masked_best2(D, mask)
    ok = (best <= 64) & (best.astype(jnp.float32)
                         < 0.8 * second.astype(jnp.float32))
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                             np.float32))
    out = twoview.initialize_two_view(
        jax.random.PRNGKey(0), f1.uv, f2.uv[idx], ok, K=K)
    assert np.isfinite(np.asarray(out.R)).all()
    assert np.isfinite(np.asarray(out.t)).all()


def test_local_ba_nan_free(nan_guard):
    from plslam_tpu.optim import local_ba
    from plslam_tpu.mapstate import state as mstate
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=384, n_levels=3, max_kf=8, max_pt=2048,
                     n_lf=32, ba_window=3, ba_points=512, ba_lines=32,
                     use_loop_closing=False, grow_map=False,
                     min_init_matches=60)
    scene = synthetic.make_scene(seed=7)
    Ts = synthetic.trajectory(14, "orbit", amplitude=1.0)
    slam = System(cfg)
    for i, T in enumerate(Ts):
        slam.track_monocular(
            np.asarray(synthetic.render(scene, T)).astype(np.uint8),
            i / 30.0)
    slam.flush()
    assert slam.state == "OK"
    assert np.isfinite(np.asarray(slam.ms.kf_T)).all()
    assert np.isfinite(np.asarray(slam.T_last)).all()
