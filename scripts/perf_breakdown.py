"""Per-stage device timing on the real TPU: extraction, tracking update,
keyframe chain, loop detect. Identifies the hot stage for optimization."""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, n=30, warmup=3):
    for _ in range(warmup):
        out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    n_frames = 40
    scene = synthetic.make_scene(seed=3)
    Ts = synthetic.trajectory(n_frames, "orbit")
    frames = [synthetic.render(scene, T) for T in Ts]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=1024, n_levels=8,
        max_kf=32, max_pt=8192, ba_window=6, ba_points=2048,
        kf_max_interval=6, async_pipeline=True, async_depth=4,
        grow_map=False,
    )
    slam = System(cfg)
    frames_dev = [jax.device_put(f.astype(np.uint8)) for f in frames]
    jax.block_until_ready(frames_dev[-1])
    for i, img in enumerate(frames_dev):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    jax.block_until_ready(slam.T_last)
    print(f"map: kf={slam.n_kf_host} pts={slam.n_map_points()}", flush=True)

    img = frames_dev[20]

    # 1) extraction (points + lines + undistort), the System's jitted path
    t_ext = timeit(lambda: slam._extract(img))
    feats, lfeats = slam._extract(img)
    jax.block_until_ready(feats.uv)

    # 2) tracking update (fused track + stats program), non-donated timing
    # copy: track_update donates ms, so time via a fresh call each loop
    # slam._track = same fused program, no stats write-back / no donation
    def track_once():
        res = slam._track(slam.ms, feats, slam.T_last,
                          lfeats=lfeats, velocity=slam.velocity)
        return res.T
    t_track = timeit(track_once, n=20)
    t_copy = 0.0

    # 3) full per-frame call (host dispatch + device), async mode
    def frame_once(i=[0]):
        i[0] += 1
        return slam.track_monocular(frames_dev[i[0] % n_frames],
                                    100.0 + i[0] / 30.0)
    for _ in range(5):
        frame_once()
    slam.flush()
    jax.block_until_ready(slam.T_last)
    t0 = time.perf_counter()
    for _ in range(30):
        frame_once()
    slam.flush()
    jax.block_until_ready(slam.T_last)
    t_frame = (time.perf_counter() - t0) / 30 * 1000

    # host-only dispatch time (no sync): how much wall the python loop costs
    t0 = time.perf_counter()
    for _ in range(30):
        frame_once()
    t_dispatch = (time.perf_counter() - t0) / 30 * 1000
    slam.flush()
    jax.block_until_ready(slam.T_last)

    print(f"extract:       {t_ext:7.2f} ms")
    print(f"track_update:  {t_track - t_copy:7.2f} ms (raw {t_track:.2f},"
          f" copy overhead {t_copy:.2f})")
    print(f"frame e2e:     {t_frame:7.2f} ms  ({1000/t_frame:.1f} fps)")
    print(f"host dispatch: {t_dispatch:7.2f} ms")


if __name__ == "__main__":
    main()
