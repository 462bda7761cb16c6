"""Stage-level wall-time profile of the per-frame pipeline on the real TPU.

Times each jitted program in isolation (dispatch-pipelined loops with one
terminal sync — per-call timers measure dispatch only on the relay), so we
can see whether the ~20 ms/frame headline is dispatch-latency or device
compute, and which stage dominates.

Run ALONE (single host core): PYTHONPATH=/root/repo python scripts/profile_stages.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=30, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    n_frames = 24
    scene = synthetic.make_scene(seed=1)
    Ts_gt = synthetic.trajectory(60, "orbit")
    frames = [np.asarray(synthetic.render(scene, T)) for T in Ts_gt[:n_frames]]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=1024, n_levels=8,
        max_kf=24, max_pt=8192, ba_window=6, ba_points=2048,
        kf_max_interval=6, async_pipeline=True, async_depth=4,
    )
    slam = System(cfg)
    frames_dev = [jax.device_put(f.astype(np.uint8)) for f in frames]
    jax.block_until_ready(frames_dev[-1])

    t0 = time.perf_counter()
    for i, img in enumerate(frames_dev):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    jax.block_until_ready(slam.T_last)
    print(f"warmup+map build: {time.perf_counter()-t0:.1f}s, "
          f"kf={slam.n_keyframes()} pts={slam.n_map_points()}", flush=True)

    img = frames_dev[-1]
    ms = slam.ms
    T = slam.T_last
    vel = slam.velocity

    # --- stage: extraction (points + lines) ---
    dt = timeit(lambda: slam._extract(img))
    print(f"extract (points+lines): {dt*1000:.2f} ms", flush=True)

    feats, lfeats = slam._extract(img)
    jax.block_until_ready(feats.desc)

    # --- stage: tracking only (non-donating variant) ---
    dt = timeit(lambda: slam._track(ms, feats, T, lfeats=lfeats, velocity=vel))
    print(f"track_local_map:        {dt*1000:.2f} ms", flush=True)

    # --- chained extract+track (what a frame actually costs) ---
    def chain():
        f, lf = slam._extract(img)
        return slam._track(ms, f, T, lfeats=lf, velocity=vel)
    dt = timeit(chain)
    print(f"extract+track chained:  {dt*1000:.2f} ms", flush=True)

    # --- points-only vs lines-only extraction (new small jits) ---
    from plslam_tpu.ops import extract as ex_ops
    from plslam_tpu.ops import lines as line_ops
    ep = jax.jit(lambda im: ex_ops.extract_points(im.astype(jnp.float32),
                                                  slam.ext_cfg))
    dt = timeit(lambda: ep(img))
    print(f"extract_points only:    {dt*1000:.2f} ms", flush=True)
    dl = jax.jit(lambda im: line_ops.detect_lines(im.astype(jnp.float32),
                                                  n_out=cfg.n_lf))
    dt = timeit(lambda: dl(img))
    print(f"detect_lines only:      {dt*1000:.2f} ms", flush=True)

    if "--sub" in sys.argv:
        from plslam_tpu.ops import fast as fast_ops
        from plslam_tpu.ops import orb as orb_ops
        from plslam_tpu.ops import pyramid as pyr_ops
        from plslam_tpu.ops import select as sel_ops
        imf = img.astype(jnp.float32)
        imf = jax.jit(lambda x: x.astype(jnp.float32))(img)
        jax.block_until_ready(imf)

        pyr = jax.jit(lambda im: tuple(
            pyr_ops.build_pyramid(im, slam.ext_cfg.n_levels,
                                  slam.ext_cfg.scale)))
        dt = timeit(lambda: pyr(imf))
        print(f"  pyramid (8 lvls):     {dt*1000:.2f} ms", flush=True)

        f0 = jax.jit(lambda im: fast_ops.fast_dual_threshold(
            im, cfg.th_fast_high, cfg.th_fast_low, 20))
        dt = timeit(lambda: f0(imf))
        print(f"  FAST dual lvl0:       {dt*1000:.2f} ms", flush=True)
        score = f0(imf)
        jax.block_until_ready(score)

        s0 = jax.jit(lambda sc: sel_ops.select_grid_topk(sc, 295, cell=32))
        dt = timeit(lambda: s0(score))
        print(f"  select lvl0:          {dt*1000:.2f} ms", flush=True)
        uv, _, _ = s0(score)
        jax.block_until_ready(uv)

        a0 = jax.jit(lambda im, uv: orb_ops.ic_angle(im, uv))
        dt = timeit(lambda: a0(imf, uv))
        print(f"  ic_angle lvl0:        {dt*1000:.2f} ms", flush=True)
        ang = a0(imf, uv)

        b0 = jax.jit(pyr_ops.blur)
        dt = timeit(lambda: b0(imf))
        print(f"  blur lvl0:            {dt*1000:.2f} ms", flush=True)
        imb = b0(imf)

        d0 = jax.jit(lambda im, uv, ang: orb_ops.steered_descriptor(im, uv, ang))
        dt = timeit(lambda: d0(imb, uv, ang))
        print(f"  descriptor lvl0:      {dt*1000:.2f} ms", flush=True)
        return

    # --- fused keyframe chain (the _process_kf program) ---
    res = slam._track(ms, feats, T, lfeats=lfeats, velocity=vel)
    jax.block_until_ready(res.T)
    kp_depth = jnp.zeros((cfg.n_features,), jnp.float32)

    def kf_once():
        # non-donated copy each call so the donated program can't invalidate
        # the live map
        ms_c = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, 'dtype') else x, ms)
        return slam._process_kf[False](
            ms_c, feats, lfeats, res.T, res.matched_pt, res.matched_ln,
            jnp.int32(999), kp_depth, do_kf_cull=jnp.bool_(False))
    t0 = time.perf_counter()
    out = kf_once()
    jax.block_until_ready(out.kf_T)
    print(f"process_kf first call (compile+run): {time.perf_counter()-t0:.1f} s",
          flush=True)
    dt = timeit(kf_once, n=10)
    print(f"process_kf fused chain: {dt*1000:.2f} ms", flush=True)

    # --- the old 10-jit keyframe path, for comparison ---
    def kf_old():
        m = slam._insert_kf(ms, feats, res.T, res.matched_pt,
                            jnp.int32(999), lfeats=lfeats,
                            matched_ln=res.matched_ln)
        k_new = slam.n_kf_host
        m = slam._create_points(m, jnp.int32(k_new), jnp.int32(k_new - 1))
        m = slam._create_points(m, jnp.int32(k_new), jnp.int32(k_new - 2))
        m = slam._create_lines(m, jnp.int32(k_new), jnp.int32(k_new - 1))
        m = slam._create_lines(m, jnp.int32(k_new), jnp.int32(k_new - 2))
        m = slam._fuse(m)
        m = slam._local_ba(m)
        m = slam._cull(m, jnp.int32(k_new))
        return m
    dt = timeit(kf_old, n=5)
    print(f"old 10-jit KF path:     {dt*1000:.2f} ms", flush=True)

    # --- batched 16-stream one step, no per-step sync ---
    from bench import _bench_multistream
    fps16 = _bench_multistream(slam, [np.asarray(f) for f in frames],
                               n_streams=16, n_steps=6)
    print(f"batched16 aggregate:    {fps16:.1f} fps "
          f"({16/fps16*1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
