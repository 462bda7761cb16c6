"""KITTI odometry monocular driver — `Examples/Monocular/mono_kitti.cc`
equivalent.

Usage: python examples/mono_kitti.py <settings.yaml> <sequence_dir> [out.txt]
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
    from plslam_tpu.datasets import kitti

    cfg = SLAMConfig.from_yaml(settings)
    slam = System(cfg)
    times = []
    for ts, img in kitti.frames(seq_dir):
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
    slam.flush()
    slam.shutdown()
    print(f"median tracking time: {sorted(times)[len(times)//2]*1000:.1f} ms")
    slam.save_trajectory_kitti(out)
    print(f"trajectory saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
