"""KITTI stereo driver — the `Examples/Stereo/stereo_kitti.cc` equivalent.

Usage:
  python examples/stereo_kitti.py <settings.yaml> <sequence_dir> [out_traj.txt]

Reads image_0 (left) and image_1 (right) of a KITTI odometry sequence.
"""
import sys
import time

import numpy as np


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    settings, seq_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "CameraTrajectory.txt"

    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.datasets import kitti, tum

    cfg = SLAMConfig.from_yaml(settings)
    slam = System(cfg)

    ts, paths_l = kitti.load_index(seq_dir, "image_0")
    _, paths_r = kitti.load_index(seq_dir, "image_1")

    times = []
    for t, pl, pr in zip(ts, paths_l, paths_r):
        img_l = tum.read_gray(pl)
        img_r = tum.read_gray(pr)
        t0 = time.perf_counter()
        slam.track_stereo(img_l, img_r, float(t))
        times.append(time.perf_counter() - t0)
    slam.flush()
    slam.shutdown()

    times = sorted(times)
    # stereo_kitti.cc prints median + mean tracking time
    print(f"median tracking time: {times[len(times) // 2] * 1000:.1f} ms")
    print(f"mean tracking time:   {np.mean(times) * 1000:.1f} ms")
    slam.save_trajectory_kitti(out)
    print(f"trajectory saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
