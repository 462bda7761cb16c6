import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.geometry import se3, sim3, camera, triangulation as tri


def _random_rotations(n, seed=0, max_angle=np.pi * 0.98):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = _random_rotations(64)
        R = se3.so3_exp(jnp.asarray(w))
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-3)

    def test_exp_zero(self):
        R = se3.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_log_near_pi(self):
        w = np.array([[np.pi - 1e-4, 0, 0], [0, 0, np.pi - 1e-4]], np.float32)
        R = se3.so3_exp(jnp.asarray(w))
        w2 = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=5e-3)

    def test_orthonormal(self):
        w = _random_rotations(16, seed=1)
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        xi = np.concatenate([_random_rotations(32, 3, 2.5), rng.normal(size=(32, 3))], -1).astype(np.float32)
        T = se3.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=3e-3)

    def test_inverse(self):
        xi = jnp.asarray(np.random.default_rng(3).normal(size=(8, 6)).astype(np.float32))
        T = se3.se3_exp(xi)
        eye = np.asarray(T @ se3.se3_inv(T))
        np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_transform_matches_matmul(self):
        rng = np.random.default_rng(4)
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32))
        T = se3.se3_exp(xi)
        pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        out = se3.transform(T, pts)
        hom = np.concatenate([np.asarray(pts), np.ones((10, 1))], -1)
        expected = (np.asarray(T) @ hom.T).T[:, :3]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_quat_roundtrip(self):
        w = _random_rotations(32, seed=5)
        R = se3.so3_exp(jnp.asarray(w))
        q = se3.rot_to_quat(R)
        R2 = se3.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(6)
        xi = np.concatenate(
            [_random_rotations(16, 7, 2.5), rng.normal(size=(16, 3)),
             rng.uniform(-0.5, 0.5, size=(16, 1))], -1).astype(np.float32)
        S = sim3.expmap(jnp.asarray(xi))
        xi2 = np.asarray(sim3.logmap(S))
        np.testing.assert_allclose(xi2, xi, atol=5e-3)

    def test_compose_inverse(self):
        rng = np.random.default_rng(7)
        xi = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32) * 0.5)
        S = sim3.expmap(xi)
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.R), np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)

    def test_apply_matches_manual(self):
        S = sim3.Sim3(jnp.float32(2.0), se3.so3_exp(jnp.array([0.1, 0.2, 0.3], jnp.float32)),
                      jnp.array([1.0, -2.0, 3.0], jnp.float32))
        x = jnp.array([0.5, 0.5, 1.0], jnp.float32)
        out = sim3.apply(S, x)
        expected = 2.0 * np.asarray(S.R) @ np.asarray(x) + np.asarray(S.t)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_se3_embedding(self):
        xi = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, -1.0], jnp.float32)
        T = se3.se3_exp(xi)
        S = sim3.from_se3(T)
        np.testing.assert_allclose(np.asarray(sim3.to_se3(S)), np.asarray(T), atol=1e-6)


TUM1 = dict(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
            k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314)


class TestCamera:
    def test_undistort_roundtrip(self):
        cam = camera.Camera.create(**TUM1)
        rng = np.random.default_rng(8)
        xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32))
        xd = camera.distort_normalized(cam, xn)
        xu = camera.undistort_normalized(cam, xd, iters=20)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)

    def test_undistort_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        cam = camera.Camera.create(**TUM1)
        rng = np.random.default_rng(9)
        uv = rng.uniform([50, 50], [590, 430], size=(50, 2)).astype(np.float32)
        ours = np.asarray(camera.undistort_pixels(cam, jnp.asarray(uv)))
        K = np.array([[TUM1["fx"], 0, TUM1["cx"]], [0, TUM1["fy"], TUM1["cy"]], [0, 0, 1]])
        dist = np.array([TUM1["k1"], TUM1["k2"], TUM1["p1"], TUM1["p2"], TUM1["k3"]])
        cv = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
        np.testing.assert_allclose(ours, cv, atol=0.1)  # sub-0.1px agreement

    def test_project_unproject(self):
        cam = camera.Camera.create(**TUM1)
        rng = np.random.default_rng(10)
        X = jnp.asarray(np.stack([rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50),
                                  rng.uniform(2, 6, 50)], -1).astype(np.float32))
        uv = camera.project(cam, X)
        rays = camera.unproject(cam, uv)
        Xr = rays * X[..., 2:3]
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-3)


class TestTriangulation:
    def _scene(self, n=64, seed=11):
        rng = np.random.default_rng(seed)
        cam = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 8, n)], -1).astype(np.float32)
        T1 = np.eye(4, dtype=np.float32)
        xi = np.array([0.02, -0.05, 0.01, 0.6, 0.05, 0.02], np.float32)
        T2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        return cam, jnp.asarray(X), jnp.asarray(T1), jnp.asarray(T2)

    def test_point_dlt(self):
        cam, X, T1, T2 = self._scene()
        uv1 = camera.project(cam, se3.transform(T1, X))
        uv2 = camera.project(cam, se3.transform(T2, X))
        P1 = tri.projection_matrix(cam, T1)
        P2 = tri.projection_matrix(cam, T2)
        Xr = tri.triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=2e-2)

    def test_line_two_view(self):
        cam, X, T1, T2 = self._scene(n=32)
        Xa = X
        Xb = X + jnp.asarray(np.random.default_rng(12).normal(size=X.shape).astype(np.float32))
        for T, name in [(T1, "1"), (T2, "2")]:
            pass
        uv1a = camera.project(cam, se3.transform(T1, Xa))
        uv1b = camera.project(cam, se3.transform(T1, Xb))
        uv2a = camera.project(cam, se3.transform(T2, Xa))
        uv2b = camera.project(cam, se3.transform(T2, Xb))
        Xra, Xrb, da, db = tri.triangulate_line_two_view(cam, T1, T2, uv1a, uv1b, uv2a, uv2b)
        np.testing.assert_allclose(np.asarray(Xra), np.asarray(Xa), atol=5e-2)
        np.testing.assert_allclose(np.asarray(Xrb), np.asarray(Xb), atol=5e-2)
        assert np.all(np.asarray(da) > 0) and np.all(np.asarray(db) > 0)

    def test_parallax(self):
        c1 = jnp.zeros(3)
        c2 = jnp.array([1.0, 0, 0])
        X = jnp.array([0.5, 0, 10.0])
        cosp = tri.parallax_cos(c1, c2, X)
        assert 0.99 < float(cosp) < 1.0
