"""TUM monocular driver — the `Examples/Monocular/mono_tum.cc` equivalent.

Usage:
  python examples/mono_tum.py <settings.yaml> <sequence_dir> [out_traj.txt]

(no vocabulary argument: place recognition is LSH-based, no 140MB ORBvoc
file needed — see plslam_tpu/vocab/bow.py)
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
    from plslam_tpu.datasets import tum

    cfg = SLAMConfig.from_yaml(settings)
    slam = System(cfg)

    times = []
    for ts, img in tum.frames(seq_dir):
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
    slam.flush()
    slam.shutdown()

    times = sorted(times)
    print(f"median tracking time: {times[len(times)//2]*1000:.1f} ms")
    print(f"mean tracking time:   {np.mean(times)*1000:.1f} ms")
    slam.save_trajectory_tum(out)
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    print(f"trajectory saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
