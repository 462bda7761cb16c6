"""Smoke-test every code path bench.py drives (VERDICT r4 item 1).

Round 4 shipped a crash in `RoundRobinTracker.step_chunks` (the `anchor_kf`
signature change reached every caller except this one) precisely because the
bench's exact paths had no test. This test drives each of them through at
least two chunks on a tiny CPU config so a signature break in any of
them fails the default suite in under a minute, not the end-of-round bench:

  - System.track_monocular (init) -> track_chunked (2 chunks)
  - System.track_synced (live-camera single-frame path)
  - RoundRobinTracker.step_chunks x2 (bench section 3, round-robin mode)
  - BatchedTracker.step x2 (bench section 3, lockstep vmap mode)

Correctness of each mode is covered elsewhere (test_e2e, test_multistream);
this is a wiring gate, so assertions are shape/finite checks only.
"""
import numpy as np
import jax
import jax.numpy as jnp

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig
from plslam_tpu.parallel.multistream import BatchedTracker, RoundRobinTracker


def _tiny_cfg():
    return SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=384, n_levels=3, max_kf=8, max_pt=2048,
        n_lf=32, ba_window=3, ba_points=512, ba_lines=32,
        kf_max_interval=5, use_loop_closing=False, grow_map=False,
        min_init_matches=60)


def test_bench_paths_smoke():
    cfg = _tiny_cfg()
    n = 14
    scene = synthetic.make_scene(seed=7)
    Ts_gt = synthetic.trajectory(n, "orbit", amplitude=1.0)
    frames = [np.asarray(synthetic.render(scene, T)).astype(np.uint8)
              for T in Ts_gt]

    # --- init per-frame, then the chunked path (bench sections 1-2) ---
    slam = System(cfg)
    i = 0
    while slam.state != "OK" and i < 6:
        slam.track_monocular(frames[i], i / 30.0)
        i += 1
    assert slam.state == "OK", "two-view init failed on the smoke fixture"
    B = 4
    for c in range(2):
        c0 = i + c * B
        imgs = jnp.stack([jnp.asarray(frames[(c0 + j) % n]) for j in range(B)])
        slam.track_chunked(imgs, [(c0 + j) / 30.0 for j in range(B)])
    slam.flush()
    T = np.asarray(slam.T_last)
    assert T.shape == (4, 4) and np.isfinite(T).all()

    # --- track_synced: the live-camera single-frame path ---
    for j in range(2):
        out = slam.track_synced(jnp.asarray(frames[j % n]), 5.0 + j / 30.0)
        assert out is not None and np.isfinite(np.asarray(out)).all()

    ms1 = slam.ms

    # --- RoundRobinTracker through 2 chunks, crossing the KF cadence ---
    S = 2
    rr = RoundRobinTracker(cfg, n_streams=S, kf_every_chunks=2)
    rr.bootstrap(ms1)
    stream_chunks = [
        jnp.stack([jnp.asarray(frames[(s * 3 + j) % n]) for j in range(B)])
        for s in range(S)]
    for _ in range(2):  # chunk 2 hits the keyframe branch (kf_every_chunks=2)
        out = rr.step_chunks(stream_chunks)
    assert len(out) == S
    for Ts in out:
        Ts = np.asarray(Ts)
        assert Ts.shape == (B, 4, 4) and np.isfinite(Ts).all()

    # --- BatchedTracker through 2 steps (track + KF branches) ---
    bt = BatchedTracker(cfg, n_streams=S, kf_interval=2)
    bt.bootstrap(jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape).copy(), ms1),
        jnp.broadcast_to(slam.T_last, (S, 4, 4)))
    imgs = jnp.stack([jnp.asarray(frames[s]) for s in range(S)])
    for _ in range(2):  # step 0 is the KF branch, step 1 the track branch
        T, scalars = bt.step(imgs)
    T = np.asarray(T)
    assert T.shape == (S, 4, 4) and np.isfinite(T).all()
