"""Unit tests for relocalization + loop-closing building blocks: RANSAC PnP,
Horn Sim3 (+RANSAC, +LM refinement), BoW scoring, essential-graph
optimization (SURVEY §4 test pyramid for the back-end stack)."""
import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.geometry import se3, sim3 as sim3_mod, camera
from plslam_tpu.geometry.sim3 import Sim3
from plslam_tpu.solvers import pnp, horn
from plslam_tpu.optim import sim3_opt, pose_graph
from plslam_tpu.vocab import bow

CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _scene(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 8, n)], -1).astype(np.float32)
    xi = np.array([0.06, -0.04, 0.02, 0.4, -0.3, 0.15], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
    uv = np.asarray(camera.project(CAM, jnp.asarray(Xc)))
    uv = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)
    return X, T, uv, rng


class TestRansacPnP:
    def test_recovers_pose_with_outliers(self):
        X, T, uv, rng = _scene()
        uv_bad = uv.copy()
        uv_bad[:30] += rng.uniform(40, 120, (30, 2)).astype(np.float32)  # 25% outliers
        res = pnp.ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(X),
                             jnp.asarray(uv_bad), jnp.ones(len(X), bool), CAM)
        assert bool(res.ok)
        d = np.asarray(se3.se3_log(jnp.asarray(np.asarray(res.T) @ np.linalg.inv(T))))
        assert np.linalg.norm(d[:3]) < 0.02, d
        assert np.linalg.norm(d[3:]) < 0.1, d
        inl = np.asarray(res.inliers)
        # the minimal DLT hypothesis is coarse; outliers must be excluded and
        # the LM refinement that follows in the reloc pipeline sharpens it
        assert inl[:30].sum() < 5
        from plslam_tpu.optim import pose_opt
        eln = pose_opt.PoseObs.empty_lines(1)
        obs = pose_opt.PoseObs(jnp.asarray(X), jnp.asarray(uv_bad),
                               jnp.ones(len(X)), jnp.ones(len(X), bool), *eln)
        out = pose_opt.pose_optimize(CAM, res.T, obs)
        refined = np.asarray(out.pt_inlier)
        assert refined[30:].mean() > 0.85 and refined[:30].sum() < 3

    def test_rejects_degenerate(self):
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        uv = jnp.asarray(rng.uniform(0, 640, (50, 2)).astype(np.float32))
        res = pnp.ransac_pnp(jax.random.PRNGKey(0), X, uv,
                             jnp.ones(50, bool), CAM)
        assert int(res.n_inliers) < 20  # random garbage shouldn't "succeed" big


class TestHornSim3:
    def test_closed_form_exact(self):
        rng = np.random.default_rng(2)
        S_true = Sim3(jnp.float32(1.7),
                      se3.so3_exp(jnp.asarray([0.2, -0.1, 0.3])),
                      jnp.asarray([0.5, -1.0, 2.0]))
        A = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        B = sim3_mod.apply(S_true, A)
        S = horn.horn_sim3(A, B)
        assert abs(float(S.s) - 1.7) < 1e-3
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_true.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_true.t), atol=1e-3)

    def test_ransac_and_refine(self):
        rng = np.random.default_rng(3)
        n = 80
        # two camera frames observing the same landmarks, related by a Sim3
        X2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.uniform(4, 8, n)], -1).astype(np.float32)
        S_true = Sim3(jnp.float32(1.3), se3.so3_exp(jnp.asarray([0.05, 0.1, -0.08])),
                      jnp.asarray([0.3, -0.2, 0.5]))
        X1 = np.asarray(sim3_mod.apply(S_true, jnp.asarray(X2)))
        uv1 = np.asarray(camera.project(CAM, jnp.asarray(X1)))
        uv2 = np.asarray(camera.project(CAM, jnp.asarray(X2)))
        mask = np.ones(n, bool)
        # corrupt 20 correspondences
        X2c = X2.copy()
        X2c[:20] += rng.uniform(1, 3, (20, 3)).astype(np.float32)
        rr = horn.ransac_sim3(jax.random.PRNGKey(0), jnp.asarray(X1),
                              jnp.asarray(X2c), jnp.asarray(uv1),
                              jnp.asarray(uv2), jnp.asarray(mask), CAM)
        assert bool(rr.ok)
        assert abs(float(rr.S12.s) - 1.3) < 0.05
        res = sim3_opt.optimize_sim3(CAM, rr.S12, jnp.asarray(X1),
                                     jnp.asarray(X2c), jnp.asarray(uv1),
                                     jnp.asarray(uv2), rr.inliers)
        assert int(res.n_inliers) >= 50
        assert abs(float(res.S12.s) - 1.3) < 0.02
        np.testing.assert_allclose(np.asarray(res.S12.R), np.asarray(S_true.R),
                                   atol=5e-3)


class TestBoW:
    def test_similar_frames_score_higher(self):
        rng = np.random.default_rng(4)
        d1 = rng.integers(0, 2, (500, 256)).astype(np.uint8)
        # frame 2 = frame 1 with 10% descriptor noise; frame 3 = unrelated
        flip = rng.random((500, 256)) < 0.05
        d2 = np.where(flip, 1 - d1, d1).astype(np.uint8)
        d3 = rng.integers(0, 2, (500, 256)).astype(np.uint8)
        v = jnp.ones(500, bool)
        b1 = bow.bow_vector(jnp.asarray(d1), v)
        b2 = bow.bow_vector(jnp.asarray(d2), v)
        b3 = bow.bow_vector(jnp.asarray(d3), v)
        W = jnp.stack([b2, b3])
        s = np.asarray(bow.l1_score(b1, W))
        assert s[0] > 2.0 * s[1], s

    def test_detect_candidates_respects_masks(self):
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.dirichlet(np.ones(bow.N_WORDS)).astype(np.float32))
        kf_bows = jnp.tile(q[None, :], (6, 1))
        kf_mask = jnp.asarray([True] * 5 + [False])
        exclude = jnp.asarray([True, False, False, False, False, False])
        idx, scores = bow.detect_candidates(q, kf_bows, kf_mask, exclude, 0.5)
        got = set(np.asarray(idx).tolist()) - {-1}
        assert 0 not in got and 5 not in got
        assert got <= {1, 2, 3, 4}


class TestEssentialGraph:
    def test_loop_closure_corrects_drift(self):
        """Chain of keyframes with accumulated drift; a loop edge between
        the ends pulls the trajectory back (the OptimizeEssentialGraph
        contract)."""
        K = 10
        # ground truth: poses around a circle returning to start
        gt = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            xi = np.array([0, 0, 0, np.cos(ang), np.sin(ang), 0], np.float32)
            gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
        gt = np.stack(gt)
        # drifted estimates: gt warped by growing error
        drift = []
        rng = np.random.default_rng(6)
        for k in range(K):
            mag = 0.05 * k
            dxi = np.array([0.01 * k, 0, 0.005 * k, mag, 0.3 * mag, 0], np.float32)
            drift.append(np.asarray(se3.se3_exp(jnp.asarray(dxi))) @ gt[k])
        drift = np.stack(drift)

        nodes = sim3_mod.from_se3(jnp.asarray(drift))
        # edges: chain with TRUE relative measurements + loop edge 0 <-> K-1
        ei, ej, Ss = [], [], []
        for k in range(1, K):
            ei.append(k)
            ej.append(k - 1)
            Si = sim3_mod.from_se3(jnp.asarray(gt[k]))
            Sj = sim3_mod.from_se3(jnp.asarray(gt[k - 1]))
            Ss.append(sim3_mod.compose(Si, sim3_mod.inverse(Sj)))
        ei.append(K - 1)
        ej.append(0)
        Si = sim3_mod.from_se3(jnp.asarray(gt[K - 1]))
        Sj = sim3_mod.from_se3(jnp.asarray(gt[0]))
        Ss.append(sim3_mod.compose(Si, sim3_mod.inverse(Sj)))

        edges = pose_graph.PoseGraphEdges(
            i=jnp.asarray(np.array(ei, np.int32)),
            j=jnp.asarray(np.array(ej, np.int32)),
            meas=Sim3(jnp.stack([S.s for S in Ss]),
                      jnp.stack([S.R for S in Ss]),
                      jnp.stack([S.t for S in Ss])),
            mask=jnp.ones(len(ei), bool),
            weight=jnp.ones(len(ei)),
        )
        fixed = jnp.asarray([True] + [False] * (K - 1))
        out = pose_graph.optimize_essential_graph(
            nodes, jnp.ones(K, bool), fixed, edges, iters=30)
        T_out = np.asarray(sim3_mod.to_se3(out))
        err_before = err_after = 0.0
        for k in range(K):
            eb = np.asarray(se3.se3_log(jnp.asarray(drift[k] @ np.linalg.inv(gt[k]))))
            ea = np.asarray(se3.se3_log(jnp.asarray(T_out[k] @ np.linalg.inv(gt[k]))))
            err_before += np.linalg.norm(eb)
            err_after += np.linalg.norm(ea)
        assert err_after < 0.15 * err_before, (err_before, err_after)


class TestEPnPMinimal:
    def test_epnp_recovers_with_heavy_outliers(self):
        """The 4-point EPnP minimal sets keep an all-inlier sample likely
        even at 40% outliers (eps^4 vs the DLT solver's eps^6) — the
        regime Relocalization actually faces (`src/PnPsolver.cc`,
        RANSAC minSet=4 at `src/Tracking.cc:2128`)."""
        X, T, uv, rng = _scene()
        n_bad = int(len(X) * 0.4)
        uv_bad = uv.copy()
        uv_bad[:n_bad] += rng.uniform(40, 120, (n_bad, 2)).astype(np.float32)
        res = pnp.ransac_pnp(jax.random.PRNGKey(3), jnp.asarray(X),
                             jnp.asarray(uv_bad), jnp.ones(len(X), bool),
                             CAM, minimal="epnp")
        assert bool(res.ok)
        d = np.asarray(se3.se3_log(jnp.asarray(
            np.asarray(res.T) @ np.linalg.inv(T))))
        assert np.linalg.norm(d[:3]) < 0.02, d
        assert np.linalg.norm(d[3:]) < 0.1, d
        assert np.asarray(res.inliers)[:n_bad].sum() < 5

    def test_epnp_not_worse_than_dlt(self):
        """Same RANSAC budget, same scene: EPnP's winning hypothesis must
        match or beat the DLT one (it solves a calibrated problem; DLT
        fits 11 projective dofs from 6 points)."""
        errs = {}
        for name in ("epnp", "dlt"):
            e = []
            for seed in (0, 1, 2):
                X, T, uv, rng = _scene()
                res = pnp.ransac_pnp(jax.random.PRNGKey(seed),
                                     jnp.asarray(X), jnp.asarray(uv),
                                     jnp.ones(len(X), bool), CAM,
                                     minimal=name)
                d = np.asarray(se3.se3_log(jnp.asarray(
                    np.asarray(res.T) @ np.linalg.inv(T))))
                e.append(float(np.linalg.norm(d)))
            errs[name] = float(np.mean(e))
        assert errs["epnp"] <= errs["dlt"] * 1.2, errs
