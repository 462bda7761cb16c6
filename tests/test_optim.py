"""Solver tests: the synthetic PnP(L) harness replicating the semantics of
the reference's only unit test (`Examples/TestDebug/testOpt.cpp`: known pose,
noisy point + line observations, solver must recover the pose), plus local
BA convergence on a perturbed synthetic window."""
import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.geometry import se3, camera, triangulation as tri
from plslam_tpu.optim import pose_opt, local_ba, residuals


CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def make_pnpl(n_pts=60, n_lines=12, noise=1.0, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                  rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    xi = np.array([0.05, -0.08, 0.03, 0.3, -0.2, 0.1], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Xc = (T_true[:3, :3] @ X.T).T + T_true[:3, 3]
    uv = np.asarray(camera.project(CAM, jnp.asarray(Xc)))
    uv = uv + rng.normal(0, noise, uv.shape).astype(np.float32)

    # lines: endpoints in world; observed as 2D lines from projected noisy endpoints
    La = np.stack([rng.uniform(-2, 2, n_lines), rng.uniform(-1.5, 1.5, n_lines),
                   rng.uniform(4, 8, n_lines)], -1).astype(np.float32)
    Lb = La + rng.normal(0, 1.0, La.shape).astype(np.float32)
    la_c = (T_true[:3, :3] @ La.T).T + T_true[:3, 3]
    lb_c = (T_true[:3, :3] @ Lb.T).T + T_true[:3, 3]
    uva = np.asarray(camera.project(CAM, jnp.asarray(la_c))) + rng.normal(0, noise, (n_lines, 2)).astype(np.float32)
    uvb = np.asarray(camera.project(CAM, jnp.asarray(lb_c))) + rng.normal(0, noise, (n_lines, 2)).astype(np.float32)
    l2d = np.asarray(tri.line_from_endpoints_2d(jnp.asarray(uva), jnp.asarray(uvb)))
    return T_true, X, uv, La, Lb, l2d


class TestPoseOptimization:
    def test_points_only_recovers_pose(self):
        T_true, X, uv, *_ = make_pnpl(noise=0.5)
        eln = pose_opt.PoseObs.empty_lines(2)
        obs = pose_opt.PoseObs(jnp.asarray(X), jnp.asarray(uv),
                               jnp.ones(len(X)), jnp.ones(len(X), bool), *eln)
        T0 = jnp.eye(4)  # start far from the true pose
        out = pose_opt.pose_optimize(CAM, T0, obs)
        d = np.asarray(se3.se3_log(jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T_true))))
        assert np.linalg.norm(d[:3]) < 2e-3, d
        assert np.linalg.norm(d[3:]) < 1e-2, d
        assert int(out.n_inliers) > 50

    def test_points_and_lines(self):
        """The testOpt.cpp scenario: points + line edges together."""
        T_true, X, uv, La, Lb, l2d = make_pnpl(noise=0.5)
        ln_xyz = np.concatenate([La, Lb])          # both endpoints as edges
        ln_l2d = np.concatenate([l2d, l2d])
        obs = pose_opt.PoseObs(
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(len(X)),
            jnp.ones(len(X), bool),
            jnp.asarray(ln_xyz), jnp.asarray(ln_l2d),
            jnp.ones(len(ln_xyz), bool), jnp.ones(len(ln_xyz)) * 1.0)
        out = pose_opt.pose_optimize(CAM, jnp.eye(4), obs)
        d = np.asarray(se3.se3_log(jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T_true))))
        assert np.linalg.norm(d[:3]) < 2e-3
        assert np.linalg.norm(d[3:]) < 1e-2

    def test_lines_only(self):
        """PoseOptimizationWithLines equivalent: line edges alone constrain
        the pose (needs enough non-parallel lines)."""
        T_true, X, uv, La, Lb, l2d = make_pnpl(n_lines=30, noise=0.3, seed=3)
        ln_xyz = np.concatenate([La, Lb])
        ln_l2d = np.concatenate([l2d, l2d])
        obs = pose_opt.PoseObs(
            jnp.zeros((2, 3)), jnp.zeros((2, 2)), jnp.ones(2),
            jnp.zeros(2, bool),
            jnp.asarray(ln_xyz), jnp.asarray(ln_l2d),
            jnp.ones(len(ln_xyz), bool), jnp.ones(len(ln_xyz)))
        # start near truth (line-only objective has weaker basin)
        xi0 = np.array([0.04, -0.06, 0.02, 0.25, -0.15, 0.08], np.float32)
        out = pose_opt.pose_optimize(CAM, se3.se3_exp(jnp.asarray(xi0)), obs)
        d = np.asarray(se3.se3_log(jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T_true))))
        assert np.linalg.norm(d[:3]) < 5e-3
        assert np.linalg.norm(d[3:]) < 5e-2

    def test_outlier_rejection(self):
        T_true, X, uv, *_ = make_pnpl(noise=0.5, seed=1)
        rng = np.random.default_rng(2)
        n_out = 15
        uv_bad = uv.copy()
        uv_bad[:n_out] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
        eln = pose_opt.PoseObs.empty_lines(2)
        obs = pose_opt.PoseObs(jnp.asarray(X), jnp.asarray(uv_bad),
                               jnp.ones(len(X)), jnp.ones(len(X), bool), *eln)
        out = pose_opt.pose_optimize(CAM, jnp.eye(4), obs)
        pt_in = np.asarray(out.pt_inlier)
        assert pt_in[:n_out].sum() == 0, "outliers not rejected"
        assert pt_in[n_out:].mean() > 0.9
        d = np.asarray(se3.se3_log(jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T_true))))
        assert np.linalg.norm(d[:3]) < 3e-3

    def test_jacobians_match_autodiff(self):
        """Analytic Jacobians vs jax.jacobian (the reference left its line
        Jacobians commented out and used numeric diff — ours must be exact)."""
        xi = jnp.asarray(np.array([0.1, -0.2, 0.05, 0.4, 0.1, -0.3], np.float32))
        T = se3.se3_exp(xi)
        X = jnp.asarray(np.array([[0.3, -0.2, 5.0]], np.float32))
        uv = jnp.asarray(np.array([[300.0, 200.0]], np.float32))
        l2d = jnp.asarray(np.array([[0.6, 0.8, -400.0]], np.float32))

        def r_pt(eps):
            Tp = se3.se3_exp(eps[None, :])[0] @ T
            r, *_ = residuals.point_residual(CAM, Tp, X, uv)
            return r[0]

        J_auto = jax.jacobian(r_pt)(jnp.zeros(6))
        _, J_an, _, _ = residuals.point_residual(CAM, T, X, uv)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_an[0]),
                                   rtol=1e-3, atol=1e-3)

        def r_ln(eps):
            Tp = se3.se3_exp(eps[None, :])[0] @ T
            r, *_ = residuals.line_endpoint_residual(CAM, Tp, X, l2d)
            return r[0]

        Jl_auto = jax.jacobian(r_ln)(jnp.zeros(6))
        _, Jl_an, _, _ = residuals.line_endpoint_residual(CAM, T, X, l2d)
        np.testing.assert_allclose(np.asarray(Jl_auto), np.asarray(Jl_an[0]),
                                   rtol=1e-3, atol=1e-3)

        # point Jacobians wrt the landmark
        def r_pt_x(dx):
            r, *_ = residuals.point_residual(CAM, T, X + dx[None, :], uv)
            return r[0]

        Jx_auto = jax.jacobian(r_pt_x)(jnp.zeros(3))
        _, _, Jx_an, _ = residuals.point_residual(CAM, T, X, uv)
        np.testing.assert_allclose(np.asarray(Jx_auto), np.asarray(Jx_an[0]),
                                   rtol=1e-3, atol=1e-3)


class TestLocalBA:
    def _window(self, K=4, P=120, L=10, noise=0.4, seed=0):
        rng = np.random.default_rng(seed)
        X = np.stack([rng.uniform(-2.5, 2.5, P), rng.uniform(-2, 2, P),
                      rng.uniform(4, 9, P)], -1).astype(np.float32)
        Ts = []
        for k in range(K):
            xi = np.array([0.02 * k, -0.01 * k, 0.005 * k,
                           0.3 * k, 0.02 * k, 0.01 * k], np.float32)
            Ts.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
        Ts = np.stack(Ts)
        obs_uv = np.zeros((K, P, 2), np.float32)
        obs_mask = np.zeros((K, P), bool)
        for k in range(K):
            Xc = (Ts[k][:3, :3] @ X.T).T + Ts[k][:3, 3]
            uv = np.asarray(camera.project(CAM, jnp.asarray(Xc)))
            ok = (Xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
            obs_uv[k] = uv + rng.normal(0, noise, uv.shape)
            obs_mask[k] = ok

        La = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                       rng.uniform(4, 8, L)], -1).astype(np.float32)
        Lb = La + rng.normal(0, 1.0, La.shape).astype(np.float32)
        ln_xyz = np.stack([La, Lb], 1)
        ln_l2d = np.zeros((K, L, 3), np.float32)
        ln_obs_mask = np.zeros((K, L), bool)
        for k in range(K):
            for i in range(L):
                a_c = Ts[k][:3, :3] @ La[i] + Ts[k][:3, 3]
                b_c = Ts[k][:3, :3] @ Lb[i] + Ts[k][:3, 3]
                if a_c[2] < 0.5 or b_c[2] < 0.5:
                    continue
                ua = np.asarray(camera.project(CAM, jnp.asarray(a_c))) + rng.normal(0, noise, 2)
                ub = np.asarray(camera.project(CAM, jnp.asarray(b_c))) + rng.normal(0, noise, 2)
                ln_l2d[k, i] = np.asarray(tri.line_from_endpoints_2d(
                    jnp.asarray(ua.astype(np.float32)), jnp.asarray(ub.astype(np.float32))))
                ln_obs_mask[k, i] = True
        return Ts, X, obs_uv, obs_mask, ln_xyz, ln_l2d, ln_obs_mask

    def test_ba_reduces_perturbation(self):
        K, P, L = 4, 120, 10
        Ts, X, obs_uv, obs_mask, ln_xyz, ln_l2d, ln_obs_mask = self._window(K, P, L)
        rng = np.random.default_rng(5)
        Ts_pert = Ts.copy()
        for k in range(1, K):  # first camera fixed (gauge)
            dxi = rng.normal(0, 0.01, 6).astype(np.float32) * np.array([1, 1, 1, 3, 3, 3], np.float32)
            Ts_pert[k] = np.asarray(se3.se3_exp(jnp.asarray(dxi))) @ Ts[k]
        X_pert = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
        ln_pert = ln_xyz + rng.normal(0, 0.05, ln_xyz.shape).astype(np.float32)

        prob = local_ba.BAProblem(
            kf_T=jnp.asarray(Ts_pert),
            kf_fixed=jnp.asarray([True] + [False] * (K - 1)),
            kf_mask=jnp.ones(K, bool),
            pt_xyz=jnp.asarray(X_pert),
            pt_mask=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_mask=jnp.asarray(obs_mask),
            obs_sigma2=jnp.ones((K, P)),
            ln_xyz=jnp.asarray(ln_pert),
            ln_mask=jnp.ones(L, bool),
            ln_obs_l2d=jnp.asarray(ln_l2d),
            ln_obs_mask=jnp.asarray(ln_obs_mask),
        )
        res = local_ba.bundle_adjust(prob, CAM)
        # pose errors should shrink well below the perturbation
        for k in range(1, K):
            d = np.asarray(se3.se3_log(jnp.asarray(
                np.asarray(res.kf_T[k]) @ np.linalg.inv(Ts[k]))))
            assert np.linalg.norm(d[:3]) < 3e-3, (k, d)
            assert np.linalg.norm(d[3:]) < 2e-2, (k, d)
        # points should be pulled back toward truth
        pt_err = np.linalg.norm(np.asarray(res.pt_xyz) - X, axis=-1)
        assert np.median(pt_err) < np.median(np.linalg.norm(X_pert - X, axis=-1))
        assert np.asarray(res.obs_inlier).sum() > 0.9 * obs_mask.sum()

    def test_ba_fixed_cameras_stay_fixed(self):
        K, P, L = 3, 60, 4
        Ts, X, obs_uv, obs_mask, ln_xyz, ln_l2d, ln_obs_mask = self._window(K, P, L, seed=7)
        prob = local_ba.BAProblem(
            kf_T=jnp.asarray(Ts),
            kf_fixed=jnp.asarray([True, True, False]),
            kf_mask=jnp.ones(K, bool),
            pt_xyz=jnp.asarray(X),
            pt_mask=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_mask=jnp.asarray(obs_mask),
            obs_sigma2=jnp.ones((K, P)),
            ln_xyz=jnp.asarray(ln_xyz),
            ln_mask=jnp.ones(L, bool),
            ln_obs_l2d=jnp.asarray(ln_l2d),
            ln_obs_mask=jnp.asarray(ln_obs_mask),
        )
        res = local_ba.bundle_adjust(prob, CAM)
        np.testing.assert_array_equal(np.asarray(res.kf_T[0]), Ts[0])
        np.testing.assert_array_equal(np.asarray(res.kf_T[1]), Ts[1])


class TestStereoEdges:
    """3-dof stereo point edges (`EdgeStereoSE3ProjectXYZ`,
    types_six_dof_expmap.h:144): u_r = u_l - bf/z anchors depth/scale."""
    BF = 500.0 * 0.3  # fx * baseline

    def _stereo_obs(self, noise=0.5, seed=1):
        rng = np.random.default_rng(seed)
        T_true, X, uv, *_ = make_pnpl(noise=noise, seed=seed)
        Xc = (T_true[:3, :3] @ X.T).T + T_true[:3, 3]
        ur = uv[:, 0] - self.BF / Xc[:, 2] \
            + rng.normal(0, noise, len(X)).astype(np.float32)
        # a third of the observations stay monocular (ur = -1)
        ur[::3] = -1.0
        return T_true, X, uv, ur

    def test_stereo_jacobian_matches_autodiff(self):
        T_true, X, uv, ur = self._stereo_obs()
        T = jnp.asarray(T_true)

        def r_st(xi):
            Tp = se3.se3_exp(xi) @ T
            r, *_ = residuals.point_residual_stereo(
                CAM, self.BF, Tp, jnp.asarray(X), jnp.asarray(uv),
                jnp.asarray(ur))
            return r
        J_auto = jax.jacobian(r_st)(jnp.zeros(6))
        _, J_an, _, _ = residuals.point_residual_stereo(
            CAM, self.BF, T, jnp.asarray(X), jnp.asarray(uv), jnp.asarray(ur))
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_an),
                                   rtol=1e-4, atol=1e-4)

        def r_x(dx):
            r, *_ = residuals.point_residual_stereo(
                CAM, self.BF, T, jnp.asarray(X) + dx[None, :],
                jnp.asarray(uv), jnp.asarray(ur))
            return r
        Jx_auto = jax.jacobian(r_x)(jnp.zeros(3))
        _, _, Jx_an, _ = residuals.point_residual_stereo(
            CAM, self.BF, T, jnp.asarray(X), jnp.asarray(uv), jnp.asarray(ur))
        np.testing.assert_allclose(np.asarray(Jx_auto), np.asarray(Jx_an),
                                   rtol=1e-4, atol=1e-4)

    def test_stereo_pose_opt_recovers_depth_translation(self):
        """Pure forward translation is weakly observable from mono edges of
        near-frontal points; the u_r component pins it."""
        T_true, X, uv, ur = self._stereo_obs(noise=0.3)
        eln = pose_opt.PoseObs.empty_lines(2)
        obs = pose_opt.PoseObs(jnp.asarray(X), jnp.asarray(uv),
                               jnp.ones(len(X)), jnp.ones(len(X), bool),
                               *eln, pt_ur=jnp.asarray(ur), bf=self.BF)
        out = pose_opt.pose_optimize(CAM, jnp.eye(4), obs)
        d = np.asarray(se3.se3_log(
            jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T_true))))
        assert np.linalg.norm(d[:3]) < 2e-3, d
        assert np.linalg.norm(d[3:]) < 1e-2, d

    def test_stereo_ba_pins_scale(self):
        """A BA window whose initial landmarks carry a 5% scale error must
        pull back toward metric scale with stereo edges (mono BA cannot:
        scale is gauge there)."""
        rng = np.random.default_rng(3)
        K, P = 4, 120
        X = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                      rng.uniform(4, 8, P)], -1).astype(np.float32)
        kf_T = []
        for k in range(K):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = -0.25 * k
            kf_T.append(T)
        kf_T = np.stack(kf_T)
        obs_uv = np.zeros((K, P, 2), np.float32)
        obs_ur = np.zeros((K, P), np.float32)
        for k in range(K):
            Xc = (kf_T[k, :3, :3] @ X.T).T + kf_T[k, :3, 3]
            uv = np.asarray(camera.project(CAM, jnp.asarray(Xc)))
            obs_uv[k] = uv + rng.normal(0, 0.3, uv.shape)
            obs_ur[k] = obs_uv[k][:, 0] - self.BF / Xc[:, 2]
        X0 = X * 1.05  # scaled-up initial landmarks
        prob = local_ba.BAProblem(
            kf_T=jnp.asarray(kf_T),
            kf_fixed=jnp.asarray([True] + [False] * (K - 1)),
            kf_mask=jnp.ones(K, bool),
            pt_xyz=jnp.asarray(X0),
            pt_mask=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_mask=jnp.ones((K, P), bool),
            obs_sigma2=jnp.ones((K, P)),
            **local_ba.BAProblem.empty_lines(K),
            obs_ur=jnp.asarray(obs_ur), bf=self.BF)
        res = local_ba.bundle_adjust(prob, CAM)
        err0 = np.linalg.norm(X0 - X, axis=-1).mean()
        err1 = np.linalg.norm(np.asarray(res.pt_xyz) - X, axis=-1).mean()
        assert err1 < 0.25 * err0, (err0, err1)
