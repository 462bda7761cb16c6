"""Batched multi-stream mode over the virtual 8-device mesh: streams with
identical inputs must produce identical trajectories (SURVEY §4 item 5),
and the batched tracker must actually track (ATE gate vs ground truth)."""
import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
from plslam_tpu.parallel import streams as pstreams
from plslam_tpu.parallel.multistream import BatchedTracker


def test_identical_streams_identical_trajectories():
    S = 8
    n = 16
    scene = synthetic.make_scene(seed=7)
    Ts_gt = synthetic.trajectory(n + 6, "orbit", amplitude=1.0)
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=384, n_levels=3, max_kf=10, max_pt=3072,
                     n_lf=64, ba_window=4, ba_points=768, ba_lines=64,
                     kf_max_interval=5, use_loop_closing=False,
                     min_init_matches=60)

    # bootstrap one stream with the normal System (two-view init)
    boot = System(cfg)
    i = 0
    while boot.state != "OK" and i < 6:
        boot.track_monocular(synthetic.render(scene, Ts_gt[i]), i / 30.0)
        i += 1
    assert boot.state == "OK"
    boot.flush()

    mesh = pstreams.make_mesh()
    bt = BatchedTracker(cfg, S, mesh=mesh, kf_interval=5)
    ms_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape).copy(), boot.ms)
    bt.bootstrap(pstreams.shard_streams(mesh, ms_b),
                 jnp.broadcast_to(boot.T_last, (S, 4, 4)))

    Ts = []
    for j in range(n):
        img = synthetic.render(scene, Ts_gt[i + j])
        imgs = np.broadcast_to(img, (S,) + img.shape)
        T, scalars = bt.step(imgs)
        Ts.append(np.asarray(T))
        sc = np.asarray(scalars)
        # every stream identical
        assert (sc == sc[0]).all(), f"stream scalars diverged at frame {j}"
    Ts = np.stack(Ts)  # (n, S, 4, 4)
    for s in range(1, S):
        np.testing.assert_allclose(Ts[:, s], Ts[:, 0], atol=1e-5)

    # and the batched tracker actually tracks: ATE of stream 0
    ate = synthetic.ate_rmse(Ts[:, 0], Ts_gt[i:i + n])
    assert ate < 0.05, f"batched ATE {ate:.3f} m"
    # inliers healthy
    assert int(np.asarray(scalars)[0][0]) > 50
