"""EuRoC monocular driver — `Examples/Monocular/mono_euroc.cc` equivalent.

Usage:
  python examples/mono_euroc.py <settings.yaml> <cam0_data_dir> <timestamps.txt> [out.txt]
"""
import sys
import time


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    settings, img_dir, ts_file = sys.argv[1], sys.argv[2], sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "CameraTrajectory.txt"

    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.datasets import euroc

    cfg = SLAMConfig.from_yaml(settings)
    slam = System(cfg)
    times = []
    for ts, img in euroc.frames(img_dir, ts_file):
        t0 = time.perf_counter()
        slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
    slam.flush()
    slam.shutdown()
    print(f"median tracking time: {sorted(times)[len(times)//2]*1000:.1f} ms")
    slam.save_keyframe_trajectory_tum(out)
    print(f"trajectory saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
