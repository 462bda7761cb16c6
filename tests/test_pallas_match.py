"""Pallas fused gated-Hamming kernel vs the jnp reference path (interpreter
mode on CPU; the compiled kernel runs on TPU in bench/production)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.ops import hamming


def _reference(q_bits, q_uv, q_oct, q_valid, d_bits, d_uv, d_rad, d_lvl, d_vis):
    D = hamming.distance_matrix(q_bits, d_bits)
    in_win = ((jnp.abs(q_uv[:, 0:1] - d_uv[None, :, 0]) < d_rad[None, :])
              & (jnp.abs(q_uv[:, 1:2] - d_uv[None, :, 1]) < d_rad[None, :]))
    oct_ok = jnp.abs(q_oct[:, None] - d_lvl[None, :]) <= 1
    mask = in_win & oct_ok & d_vis[None, :] & q_valid[:, None]
    return hamming.masked_best2(D, mask)


def test_pallas_kernel_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    from plslam_tpu.ops import pallas_match

    rng = np.random.default_rng(0)
    N, P = 200, 700  # deliberately not tile-aligned
    q_bits = jnp.asarray(rng.integers(0, 2, (N, 256)).astype(np.uint8))
    d_bits = jnp.asarray(rng.integers(0, 2, (P, 256)).astype(np.uint8))
    q_uv = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
    d_uv = jnp.asarray(rng.uniform(0, 640, (P, 2)).astype(np.float32))
    q_oct = jnp.asarray(rng.integers(0, 4, N).astype(np.int32))
    d_lvl = jnp.asarray(rng.integers(0, 4, P).astype(np.int32))
    d_rad = jnp.asarray(rng.uniform(30, 120, P).astype(np.float32))
    q_valid = jnp.asarray(rng.random(N) > 0.1)
    d_vis = jnp.asarray(rng.random(P) > 0.2)

    ref_idx, ref_best, ref_second = _reference(
        q_bits, q_uv, q_oct, q_valid, d_bits, d_uv, d_rad, d_lvl, d_vis)

    with pltpu.force_tpu_interpret_mode():
        idx, best, second = pallas_match.gated_hamming_best2(
            q_bits, q_uv, q_oct, q_valid, d_bits, d_uv, d_rad, d_lvl, d_vis)

    best = np.asarray(best)
    ref_best_n = np.asarray(ref_best)
    # where nothing matched both paths must agree on INVALID
    np.testing.assert_array_equal(best >= hamming.INVALID,
                                  ref_best_n >= int(hamming.INVALID))
    m = best < hamming.INVALID
    np.testing.assert_array_equal(best[m], ref_best_n[m])
    np.testing.assert_array_equal(np.asarray(idx)[m], np.asarray(ref_idx)[m])
    s = np.asarray(second)
    rs = np.asarray(ref_second)
    m2 = (s < hamming.INVALID) & (rs < int(hamming.INVALID))
    np.testing.assert_array_equal(s[m2], rs[m2])


def test_pallas_backend_in_tracking_pipeline():
    """matcher_backend="pallas" must reproduce the xla path's tracking
    result end-to-end (same pose, same inlier count) — the wiring gate for
    the flag-gated backend (VERDICT r4 item 8)."""
    from jax.experimental.pallas import tpu as pltpu
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models import tracking
    from plslam_tpu.models.system import System, SLAMConfig

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=384, n_levels=3, max_kf=8, max_pt=2048,
        n_lf=32, ba_window=3, ba_points=512, ba_lines=32,
        kf_max_interval=5, use_loop_closing=False, grow_map=False,
        min_init_matches=60)
    scene = synthetic.make_scene(seed=7)
    Ts = synthetic.trajectory(14, "orbit", amplitude=1.0)
    frames = [np.asarray(synthetic.render(scene, T)).astype(np.uint8)
              for T in Ts]
    slam = System(cfg)
    i = 0
    while slam.state != "OK" and i < 8:
        slam.track_monocular(frames[i], i / 30.0)
        i += 1
    assert slam.state == "OK"
    feats, lfeats = slam._extract(jnp.asarray(frames[i]))
    common = dict(scale_factors=slam.scale_factors,
                  sigma2_levels=slam.sigma2,
                  n_levels=cfg.n_levels, scale=cfg.scale_factor,
                  velocity=jnp.eye(4))
    r_xla = tracking.track_local_map(
        slam.cam, slam.ms, feats, slam.T_last, lfeats=lfeats, **common)
    with pltpu.force_tpu_interpret_mode():
        r_pal = tracking.track_local_map(
            slam.cam, slam.ms, feats, slam.T_last, lfeats=lfeats,
            matcher_backend="pallas", **common)
    assert int(r_xla.n_inliers) == int(r_pal.n_inliers)
    np.testing.assert_allclose(np.asarray(r_xla.T), np.asarray(r_pal.T),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r_xla.matched_pt),
                                  np.asarray(r_pal.matched_pt))
