"""TUM RGB-D driver — the `Examples/RGB-D/rgbd_tum.cc` equivalent.

Usage:
  python examples/rgbd_tum.py <settings.yaml> <sequence_dir> <associations.txt> [out_traj.txt]

(no vocabulary argument: place recognition is LSH-based, no 140MB ORBvoc
file needed — see plslam_tpu/vocab/bow.py)
"""
import sys
import time

import numpy as np


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    settings, seq_dir, assoc = sys.argv[1], sys.argv[2], sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "CameraTrajectory.txt"

    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.datasets import tum

    cfg = SLAMConfig.from_yaml(settings)
    slam = System(cfg)

    pairs = tum.load_associations(assoc, seq_dir)
    if not pairs:
        print("No images found in association file (rgbd_tum.cc:58)")
        return 1

    times = []
    for t_rgb, p_rgb, _t_d, p_d in pairs:
        img = tum.read_gray(p_rgb)
        import cv2
        depth_raw = cv2.imread(p_d, cv2.IMREAD_UNCHANGED)
        if depth_raw is None:
            print(f"Failed to load depth image at: {p_d}")
            return 1
        t0 = time.perf_counter()
        slam.track_rgbd(img, depth_raw.astype(np.float32), t_rgb)
        times.append(time.perf_counter() - t0)
    slam.flush()
    slam.shutdown()

    times = sorted(times)
    # rgbd_tum.cc:135-140 prints median + mean tracking time
    print(f"median tracking time: {times[len(times) // 2] * 1000:.1f} ms")
    print(f"mean tracking time:   {np.mean(times) * 1000:.1f} ms")
    slam.save_trajectory_tum(out)
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    print(f"trajectory saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
