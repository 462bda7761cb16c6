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


def test_stereo_depth_p90_under_2pct():
    """Far-field stereo depth accuracy (VERDICT r2 #6 / ROADMAP #2): the
    grid-consistent SAD + half-pixel bilinear second pass must keep the
    matched-keypoint depth error p90 under 2% on the rendered stereo pair
    (round 2: median 0.9%, p90 ~5% from the integer/fraction mismatch in
    the patch gather)."""
    import jax.numpy as jnp
    from plslam_tpu.ops import extract, stereo

    scene = synthetic.make_scene(seed=6)
    T = np.asarray(synthetic.trajectory(14, "orbit", amplitude=0.8)[3])
    baseline = 0.3
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline
    img_l = synthetic.render(scene, T)
    img_r = synthetic.render(scene, T_rl @ T)
    _, dep = synthetic.render_rgbd(scene, T)

    ecfg = extract.ExtractorConfig(n_features=512, n_levels=3)
    sf, _ = extract.scale_factors(ecfg)
    fl = extract.extract_points(jnp.asarray(img_l), ecfg)
    fr = extract.extract_points(jnp.asarray(img_r), ecfg)
    depth, _, ok = stereo.stereo_match(
        fl, fr, jnp.asarray(img_l, jnp.float32),
        jnp.asarray(img_r, jnp.float32), 500.0, baseline, sf)
    okn = np.asarray(ok)
    uv = np.asarray(fl.uv)[okn]
    d_est = np.asarray(depth)[okn]
    d_gt = dep[np.clip(np.round(uv[:, 1]).astype(int), 0, 479),
               np.clip(np.round(uv[:, 0]).astype(int), 0, 639)]
    valid = d_gt > 0
    rel = np.abs(d_est[valid] - d_gt[valid]) / d_gt[valid]
    assert valid.sum() > 150
    assert np.median(rel) < 0.006, f"median {np.median(rel):.4f}"
    assert np.percentile(rel, 90) < 0.02, f"p90 {np.percentile(rel, 90):.4f}"
    far = d_gt[valid] > np.median(d_gt[valid])
    assert np.percentile(rel[far], 90) < 0.02, (
        f"far-field p90 {np.percentile(rel[far], 90):.4f}")


def test_fix_scale_sim3_is_rigid():
    """Depth sensors observe metric scale: with fix_scale=True (stereo/
    RGB-D, `src/System.cc:106`) the Horn solver and the essential-graph
    optimizer must not introduce a scale DOF even when the data suggests
    one."""
    import jax.numpy as jnp
    from plslam_tpu.solvers import horn
    from plslam_tpu.geometry.sim3 import Sim3
    from plslam_tpu.optim import pose_graph

    rng = np.random.default_rng(0)
    A = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
    B = 1.3 * A + np.asarray([0.5, 0, 0], np.float32)  # scaled+shifted
    S = horn.horn_sim3(jnp.asarray(A), jnp.asarray(B), fix_scale=True)
    assert float(S.s) == 1.0
    S2 = horn.horn_sim3(jnp.asarray(A), jnp.asarray(B), fix_scale=False)
    assert abs(float(S2.s) - 1.3) < 1e-3

    # essential graph with one loop edge implying scale 1.2: fixed-scale
    # optimization must keep every node's scale exactly 1
    K = 6
    nodes = Sim3(jnp.ones((K,)),
                 jnp.broadcast_to(jnp.eye(3), (K, 3, 3)),
                 jnp.asarray(np.stack([np.arange(K), np.zeros(K),
                                       np.zeros(K)], -1), jnp.float32))
    ei = jnp.asarray(list(range(K - 1)) + [0], jnp.int32)
    ej = jnp.asarray(list(range(1, K)) + [K - 1], jnp.int32)
    meas_s = np.ones(K, np.float32)
    meas_s[-1] = 1.2  # loop edge measured with a scale drift
    meas = Sim3(jnp.asarray(meas_s),
                jnp.broadcast_to(jnp.eye(3), (K, 3, 3)),
                jnp.asarray(np.stack([-np.ones(K), np.zeros(K),
                                      np.zeros(K)], -1), jnp.float32))
    edges = pose_graph.PoseGraphEdges(
        i=ei, j=ej, meas=meas, mask=jnp.ones((K,), bool),
        weight=jnp.ones((K,)))
    node_mask = jnp.ones((K,), bool)
    fixed = jnp.asarray([True] + [False] * (K - 1))
    out = pose_graph.optimize_essential_graph(
        nodes, node_mask, fixed, edges, fix_scale=True)
    np.testing.assert_allclose(np.asarray(out.s), 1.0, atol=1e-6)
