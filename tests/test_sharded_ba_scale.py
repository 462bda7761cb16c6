"""Sharded-GBA equality at scale (VERDICT r3 item 9).

`tests/test_sharded_ba.py` proves shard-vs-single-device agreement on a
toy window; this file grows the problem toward KITTI shape: a long
forward trajectory of keyframes, tens of thousands of landmarks, each
observed by a handful of consecutive keyframes (the covisibility pattern
of `src/Optimizer.cc:41-640` at KITTI 00 scale).

Size note (measured, this container): the reduced-camera assembly is a
(6K x 3P) x (3P x 6K) contraction, ~216*K^2*P flops per LM iteration.
The verdict's literal 512 KF x 50k landmark target is ~2.8e15 flops PER
ITERATION — days on this 1-core CPU box, and the 8-device mesh is only
virtual here (one physical core), so the full-size case cannot run under
pytest. This test runs the largest tractable shape (K=128, P=25.6k,
~2.7e12 flops total, a few minutes) on the virtual 8-device mesh; the
full 512 KF / 51.2k landmark problem is exercised single-device on the
real TPU chip by `scripts/gba_scale_tpu.py` (numbers in BASELINE.md).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from plslam_tpu.geometry import camera, se3
from plslam_tpu.optim import local_ba
from plslam_tpu.parallel import sharded_ba, streams as pstreams

CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                           width=640, height=480)


def make_kitti_like(K: int, P: int, obs_span: int = 6, noise: float = 0.5,
                    seed: int = 11):
    """Forward-motion trajectory; landmark p is anchored near keyframe
    owner(p) and observed by up to `obs_span` consecutive keyframes —
    vectorized over K (no per-camera python loops at this scale)."""
    rng = np.random.default_rng(seed)
    # keyframes every 0.4 m along z with gentle lateral sway
    ks = np.arange(K, dtype=np.float32)
    xi = np.zeros((K, 6), np.float32)
    xi[:, 3] = 0.15 * np.sin(0.1 * ks)
    xi[:, 5] = 0.4 * ks
    xi[:, 1] = 0.03 * np.sin(0.05 * ks)
    Ts = np.asarray(jax.vmap(se3.se3_exp)(jnp.asarray(xi)))

    owner = rng.integers(0, K, P)
    # world position: in front of the owner camera at 4-10 m depth
    depth = rng.uniform(4.0, 10.0, P).astype(np.float32)
    uv0 = np.stack([rng.uniform(40, 600, P), rng.uniform(40, 440, P)],
                   -1).astype(np.float32)
    xn = (uv0[:, 0] - 320.0) / 500.0
    yn = (uv0[:, 1] - 240.0) / 500.0
    Xc = np.stack([xn * depth, yn * depth, depth], -1)
    Ro = Ts[owner, :3, :3]
    to = Ts[owner, :3, 3]
    X = np.einsum("pji,pj->pi", Ro, Xc - to).astype(np.float32)

    # observations: keyframes [owner, owner+obs_span)
    obs_uv = np.zeros((K, P, 2), np.float32)
    obs_mask = np.zeros((K, P), bool)
    for d in range(obs_span):
        k = np.minimum(owner + d, K - 1)
        Xck = np.einsum("pij,pj->pi", Ts[k, :3, :3], X) + Ts[k, :3, 3]
        z = Xck[:, 2]
        uv = np.stack([500.0 * Xck[:, 0] / np.maximum(z, 1e-6) + 320.0,
                       500.0 * Xck[:, 1] / np.maximum(z, 1e-6) + 240.0], -1)
        ok = (z > 0.5) & (uv[:, 0] > 2) & (uv[:, 0] < 638) \
            & (uv[:, 1] > 2) & (uv[:, 1] < 478)
        obs_uv[k[ok], np.arange(P)[ok]] = \
            uv[ok] + rng.normal(0, noise, (int(ok.sum()), 2))
        obs_mask[k[ok], np.arange(P)[ok]] = True

    n_obs = obs_mask.sum(0)
    keep = n_obs >= 2
    # perturb: growing pose error along the trajectory (drift-shaped), and
    # landmark noise
    Ts_pert = Ts.copy()
    rngp = np.random.default_rng(seed + 1)
    for k in range(1, K):
        mag = 0.002 + 0.01 * k / K
        dxi = rngp.normal(0, mag, 6).astype(np.float32) \
            * np.array([1, 1, 1, 4, 4, 4], np.float32)
        Ts_pert[k] = np.asarray(se3.se3_exp(jnp.asarray(dxi))) @ Ts[k]
    X_pert = X + rngp.normal(0, 0.05, X.shape).astype(np.float32)

    prob = local_ba.BAProblem(
        kf_T=jnp.asarray(Ts_pert),
        kf_fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        kf_mask=jnp.ones(K, bool),
        pt_xyz=jnp.asarray(X_pert),
        pt_mask=jnp.asarray(keep),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask & keep[None, :]),
        obs_sigma2=jnp.ones((K, P)),
        **local_ba.BAProblem.empty_lines(K, 8),
    )
    return prob, Ts, X


@pytest.mark.slow
def test_sharded_scale_matches_single_device():
    K, P = 128, 25600
    prob, Ts_true, X_true = make_kitti_like(K, P)
    assert len(jax.devices()) >= 8
    mesh = pstreams.make_mesh(8, axis="lm")

    # fewer LM iterations than production (2+3): the equality property is
    # iteration-wise, so 5 iterations of agreement imply the schedule agrees
    ref = local_ba.bundle_adjust(prob, CAM, iters_a=2, iters_b=3)
    sp = sharded_ba.prepare_problem(prob, 8)
    res = sharded_ba.sharded_bundle_adjust(mesh, sp, CAM,
                                           iters_a=2, iters_b=3)

    np.testing.assert_allclose(np.asarray(res.kf_T), np.asarray(ref.kf_T),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.pt_xyz)[:P],
                               np.asarray(ref.pt_xyz), rtol=1e-2, atol=1e-2)
    c_ref, c_sh = float(ref.cost), float(res.cost)
    assert abs(c_sh - c_ref) <= 0.05 * max(c_ref, 1.0), (c_sh, c_ref)
    agree = (np.asarray(res.obs_inlier)[:, :P]
             == np.asarray(ref.obs_inlier)).mean()
    assert agree > 0.99, f"inlier verdicts agree only {agree:.3f}"

    # convergence: drift-shaped pose error must shrink vs the perturbed init
    def pose_err(T_est):
        errs = []
        for k in range(2, K, 7):
            d = np.asarray(se3.se3_log(jnp.asarray(
                np.asarray(T_est[k]) @ np.linalg.inv(Ts_true[k]))))
            errs.append(np.linalg.norm(d[:3]))  # rotation part (scale gauge)
        return float(np.mean(errs))
    e0 = pose_err(np.asarray(prob.kf_T))
    e1 = pose_err(np.asarray(res.kf_T))
    assert e1 < 0.5 * e0, f"rotation error {e0:.4f} -> {e1:.4f}"
