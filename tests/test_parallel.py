"""Multi-device sharding tests on the 8-device virtual CPU mesh: batched
multi-stream tracking (dp over streams) and the psum-reduced edge-sharded
pose system (the sharded-GBA pattern)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from plslam_tpu.geometry import camera, se3
from plslam_tpu.optim import residuals
from plslam_tpu.parallel import streams

CAM = camera.Camera.create(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                           width=320, height=240)


def test_mesh_has_8_devices():
    mesh = streams.make_mesh()
    assert len(mesh.devices.reshape(-1)) == 8


def test_sharded_pose_system_matches_single_device():
    rng = np.random.default_rng(0)
    E = 256
    xyz = np.stack([rng.uniform(-1, 1, E), rng.uniform(-1, 1, E),
                    rng.uniform(3, 6, E)], -1).astype(np.float32)
    uv = np.asarray(camera.project(CAM, jnp.asarray(xyz)))
    uv = (uv + rng.normal(0, 1, uv.shape)).astype(np.float32)
    w = np.ones(E, np.float32)
    T = jnp.eye(4)

    mesh = streams.make_mesh(axis="edge")
    H_sh, b_sh = streams.sharded_pose_normal_equations(
        mesh, CAM, T, jnp.asarray(xyz), jnp.asarray(uv), jnp.asarray(w))

    # single-device reference
    r, J, _, z = residuals.point_residual(CAM, T, jnp.asarray(xyz), jnp.asarray(uv))
    m = jnp.asarray(w) * (z > 0)
    H_ref = jnp.einsum("nij,nik,n->jk", J, J, m)
    b_ref = -jnp.einsum("nij,ni,n->j", J, r, m)
    # psum changes f32 reduction order; compare with a scale-aware tolerance
    scale_H = float(np.abs(np.asarray(H_ref)).max())
    np.testing.assert_allclose(np.asarray(H_sh), np.asarray(H_ref),
                               atol=1e-4 * scale_H)
    scale_b = float(np.abs(np.asarray(b_ref)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(b_sh), np.asarray(b_ref),
                               atol=1e-4 * scale_b)


def test_batched_streams_shard_and_agree():
    """vmapped tracking over a sharded stream axis must equal per-stream
    sequential results."""
    from plslam_tpu.mapstate import state as mstate
    from plslam_tpu.models import tracking
    from plslam_tpu.ops import extract

    S = 8
    rng = np.random.default_rng(1)
    cfg = extract.ExtractorConfig(n_features=128, n_levels=2)
    map_cfg = mstate.MapConfig(max_kf=4, max_pt=256, max_ln=16, n_kp=128,
                               n_lf=8, n_levels=2)
    sf, s2 = extract.scale_factors(cfg)

    def make_ms(seed):
        r = np.random.default_rng(seed)
        ms = mstate.allocate(map_cfg)
        pts = np.stack([r.uniform(-1, 1, 256), r.uniform(-1, 1, 256),
                        r.uniform(2, 5, 256)], -1).astype(np.float32)
        return ms._replace(
            pt_xyz=jnp.asarray(pts), pt_valid=jnp.ones(256, bool),
            pt_max_dist=jnp.full((256,), 10.0), pt_min_dist=jnp.full((256,), 0.1),
            pt_normal=jnp.asarray(-pts / np.linalg.norm(pts, axis=-1, keepdims=True)))

    mss = [make_ms(i) for i in range(S)]
    imgs = [jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32))
            for _ in range(S)]

    def one(img, ms):
        feats = extract.extract_points(img, cfg)
        feats = feats._replace(uv_un=feats.uv)
        r = tracking.track_local_map(CAM, ms, feats, jnp.eye(4),
                                     scale_factors=sf, sigma2_levels=s2,
                                     n_levels=2, scale=1.2)
        return r.T, r.scalars

    # sequential
    seq = [one(imgs[i], mss[i]) for i in range(S)]

    # batched + sharded
    mesh = streams.make_mesh()
    ms_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *mss)
    img_b = jnp.stack(imgs)
    ms_b = streams.shard_streams(mesh, ms_b)
    img_b = jax.device_put(img_b, NamedSharding(mesh, P("stream")))
    with mesh:
        Ts, scalars = jax.jit(jax.vmap(one))(img_b, ms_b)

    for i in range(S):
        np.testing.assert_allclose(np.asarray(Ts[i]), np.asarray(seq[i][0]),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(scalars[i]),
                                      np.asarray(seq[i][1]))
