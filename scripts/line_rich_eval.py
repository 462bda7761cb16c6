"""Line-rich fixture evaluation (VERDICT r4 item 6) — the
fr3_structure_texture_far analog: a photo-textured scene dense with 3D
segments, evaluated paired (lines on vs off, same frames) with tracked
line-inlier density reported.

Usage:
  python scripts/line_rich_eval.py [--frames 180] [--seed 9]
      [--n-lines 96] [key=value SLAMConfig overrides...]

Reports per side: kf ATE, mean tracked line inliers/frame, mean point
inliers. The reference tracks ~40 line inliers/frame on fr3-like scenes
(`/root/reference/src/Optimizer.cc:966` counters); the rebuild's round-4
level was ~11.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from plslam_tpu.datasets import synthetic, textured  # noqa: E402
from plslam_tpu.models.system import System, SLAMConfig  # noqa: E402


def run(frames, Ts_gt, use_lines, overrides):
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     use_lines=use_lines, use_loop_closing=False,
                     **overrides)
    slam = System(cfg)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    n_kf = slam.n_kf_host
    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf]
    ate = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_kf], Ts_gt[fid])
    ln_inl = [s.get("line_inliers", 0) for s in slam.stats
              if not s.get("lost")]
    pt_inl = [s.get("inliers", 0) for s in slam.stats if not s.get("lost")]
    return dict(ate=float(ate), kf=int(n_kf),
                ln_inl=float(np.mean(ln_inl) if ln_inl else 0.0),
                pt_inl=float(np.mean(pt_inl) if pt_inl else 0.0),
                lost=sum(1 for s in slam.stats if s.get("lost")))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=180)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument("--n-lines", type=int, default=96)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    from ab_ours import parse_overrides
    ov = parse_overrides(args.overrides, SLAMConfig)

    scene = textured.make_photo_scene(seed=args.seed, layout="open",
                                      n_lines=args.n_lines)
    Ts = synthetic.trajectory(args.frames, "orbit", amplitude=3.0)
    for T in Ts:
        T[:3, 3] -= T[:3, :3] @ np.array([0.0, 0.0, 4.5], T.dtype)
    frames = [np.asarray(synthetic.render(scene, T)).astype(np.uint8)
              for T in Ts]
    print(f"rendered {len(frames)} frames, n_lines={args.n_lines}",
          flush=True)

    r_no = run(frames, Ts, False, ov)
    print(f"lines OFF: {r_no}", flush=True)
    r_yes = run(frames, Ts, True, ov)
    print(f"lines ON : {r_yes}", flush=True)
    verdict = "HELP" if r_yes["ate"] < r_no["ate"] else "HURT"
    print(f"lines {verdict}: ate {r_no['ate']:.4f} -> {r_yes['ate']:.4f}, "
          f"line inliers/frame {r_yes['ln_inl']:.1f}", flush=True)


if __name__ == "__main__":
    main()
