"""Benchmark: end-to-end monocular tracking throughput on one TPU chip.

Runs the full System (extract -> match-vs-map -> staged-LM pose opt, with
keyframing + triangulation + local BA at keyframes) over a rendered
640x480 synthetic sequence (TUM-like content; no datasets ship in this
environment) and reports steady-state tracked frames/sec per chip.

Baseline: the reference claims real-time tracking — >= 30 fps on TUM on an
i7 (`/root/reference/README.md:15`; `BASELINE.md`). vs_baseline = fps / 30.

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    n_frames = 60
    scene = synthetic.make_scene(seed=1)
    Ts_gt = synthetic.trajectory(n_frames, "orbit")
    frames = [np.asarray(synthetic.render(scene, T)) for T in Ts_gt]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=1024, n_levels=8,
        max_kf=24, max_pt=8192, ba_window=6, ba_points=2048,
        kf_max_interval=6, async_pipeline=True,
    )
    slam = System(cfg)

    # warmup/compile on the first frames (init + first KFs trigger all paths)
    frames_u8 = [f.astype(np.uint8) for f in frames]
    per_frame = []
    for i, img in enumerate(frames_u8):
        t0 = time.perf_counter()
        slam.track_monocular(img, i / 30.0)
        per_frame.append(time.perf_counter() - t0)
    slam.flush()

    # steady-state: tracked frames after init, excluding keyframe frames'
    # first-compile outliers — use the median over the last 2/3
    tail = per_frame[len(per_frame) // 3:]
    med = float(np.median(tail))
    fps = 1.0 / med if med > 0 else 0.0

    ate = float("nan")
    try:
        est = {ts: T for ts, T in slam.trajectory}
        idx = [i for i in range(n_frames) if (i / 30.0) in est]
        if len(idx) > 10:
            T_est = np.stack([est[i / 30.0] for i in idx])
            ate = synthetic.ate_rmse(T_est, Ts_gt[idx])
    except Exception:
        pass

    print(json.dumps({
        "metric": "tum_mono_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "median_frame_ms": round(med * 1000, 2),
            "ate_rmse_m": None if np.isnan(ate) else round(ate, 4),
            "keyframes": slam.n_keyframes(),
            "map_points": slam.n_map_points(),
            "frames": n_frames,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
