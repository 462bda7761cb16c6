"""Run the full SLAM system on a rendered synthetic sequence and report ATE.

The 'mono_tum'-style driver (cf `Examples/Monocular/mono_tum.cc`) for this
environment: the dataset is generated (exact ground truth) instead of loaded.

Usage: PYTHONPATH=/root/repo python scripts/run_synthetic.py [n_frames] [--cpu]
"""
import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from plslam_tpu.datasets import synthetic
from plslam_tpu.models.system import System, SLAMConfig


def main(n_frames=60):
    scene = synthetic.make_scene(seed=1)
    Ts_gt = synthetic.trajectory(n_frames, "orbit")
    print(f"rendering {n_frames} frames...", flush=True)
    frames = [synthetic.render(scene, T) for T in Ts_gt]

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=768, n_levels=4,
        max_kf=24, max_pt=6144, ba_window=6, ba_points=2048,
        kf_max_interval=6,
    )
    slam = System(cfg)

    t0 = time.perf_counter()
    for i, img in enumerate(frames):
        T = slam.track_monocular(img, i / 30.0)
        if i % 10 == 0:
            s = slam.stats[-1] if slam.stats else {}
            print(f"frame {i:3d} state={slam.state} T={'ok' if T is not None else 'none'} "
                  f"inliers={s.get('inliers', '-')} kfs={slam.n_keyframes()} "
                  f"pts={slam.n_map_points()}", flush=True)
    wall = time.perf_counter() - t0

    est = {ts: T for ts, T in slam.trajectory}
    # align trajectory subset with ground truth (skip pre-init frames)
    idx = [i for i in range(n_frames) if (i / 30.0) in est]
    T_est = np.stack([est[i / 30.0] for i in idx])
    T_gt = Ts_gt[idx]
    ate = synthetic.ate_rmse(T_est, T_gt)
    span = np.linalg.norm(
        (-T_gt[-1][:3, :3].T @ T_gt[-1][:3, 3]) - (-T_gt[0][:3, :3].T @ T_gt[0][:3, 3]))
    med_t = np.median(slam.timings[2:]) if len(slam.timings) > 2 else float("nan")
    print(f"\ntracked {len(idx)}/{n_frames} frames, {slam.n_keyframes()} KFs, "
          f"{slam.n_map_points()} points")
    print(f"ATE RMSE: {ate*100:.2f} cm  (trajectory span {span:.2f} m, "
          f"{100*ate/max(span,1e-9):.2f}%)")
    print(f"median frame time: {med_t*1000:.1f} ms  ({1.0/med_t:.1f} fps), "
          f"total wall {wall:.1f}s")
    return ate, span


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 60
    ate, span = main(n)
    ok = ate < 0.05 * max(span, 0.2)
    print("RESULT:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
