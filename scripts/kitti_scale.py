"""KITTI-scale behavior probe (VERDICT r2 item 3): 800+ keyframes with
repeated loop closures, bounded per-frame cost as the map grows.

Drives N laps of the 360-degree box circuit (the explicit-loop fixture of
tests/test_loop_closure_e2e.py) at a dense keyframe cadence, growing the
map from small initial capacities. Reports per-frame wall-time percentiles
bucketed by keyframe count — the reference handles KITTI 00 (~1300 KFs,
multiple loops) routinely (`src/KeyFrameDatabase.cc`, `src/Optimizer.cc:
2102`); this proves the rebuild's growth + detection + correction stack
does not hit an O(K^2) wall at the same scale.

Usage: python scripts/kitti_scale.py [--laps 8] [--cpu] [--frames-per-lap 220]
Prints one JSON summary line at the end.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--laps", type=int, default=8)
ap.add_argument("--frames-per-lap", type=int, default=220)
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--features", type=int, default=256)
args = ap.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    lap_n = args.frames_per_lap
    scene = synthetic.make_scene(seed=7, layout="box")
    lap = synthetic.trajectory(lap_n, "circle", amplitude=2.0)
    Ts = np.concatenate([lap] * args.laps)
    n = Ts.shape[0]
    print(f"{n} frames ({args.laps} laps x {lap_n})", flush=True)

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=args.features, n_levels=2,
        max_kf=64, max_pt=4096, max_ln=128, n_lf=64,  # grown on demand
        ba_window=5, ba_points=1024, ba_lines=64,
        kf_max_interval=2, kf_min_interval=2, kf_ref_ratio=2.0,
        use_loop_closing=True, grow_map=True,
    )
    slam = System(cfg)

    frame_t = np.zeros(n)
    kf_at = np.zeros(n, np.int32)
    t_all = time.perf_counter()
    for i in range(n):
        img = synthetic.render(scene, Ts[i])   # rendered on the fly: 8
        t0 = time.perf_counter()               # laps of frames don't fit RAM
        slam.track_monocular(img, i / 30.0)
        frame_t[i] = time.perf_counter() - t0
        kf_at[i] = slam.n_kf_host
        if i % 100 == 99:
            w = slam.stats[-100:]
            n_lost = sum(1 for s in w if s.get("lost"))
            n_rel = sum(1 for s in w if s.get("reloc"))
            n_kf100 = sum(1 for s in w if s.get("kf"))
            inl = [s["inliers"] for s in w if not s.get("lost")]
            print(f"frame {i+1}: kf={slam.n_kf_host} "
                  f"loops={slam.loop_closer.n_loops} "
                  f"growths={slam.n_growths} "
                  f"p50={np.median(frame_t[max(0,i-99):i+1])*1e3:.0f}ms "
                  f"lost={n_lost} reloc={n_rel} kf+={n_kf100} "
                  f"inl={np.mean(inl):.0f}" if inl else
                  f"frame {i+1}: all 100 frames lost", flush=True)
    slam.flush()
    wall = time.perf_counter() - t_all

    # per-frame cost bucketed by keyframe count: bounded growth = the
    # p50 of the last bucket is within ~2x of the first post-warmup bucket
    buckets = {}
    for lo in range(0, int(kf_at.max()) + 1, 100):
        sel = (kf_at >= lo) & (kf_at < lo + 100)
        if sel.sum() >= 20:
            t = frame_t[sel]
            buckets[f"kf_{lo}_{lo+100}"] = {
                "p50_ms": round(float(np.median(t) * 1e3), 1),
                "p90_ms": round(float(np.percentile(t, 90) * 1e3), 1),
                "p99_ms": round(float(np.percentile(t, 99) * 1e3), 1),
                "n": int(sel.sum()),
            }

    n_kf = slam.n_kf_host
    # culled keyframes leave kf_valid=False slots with stale poses —
    # evaluate ATE over the ALIVE keyframes only
    alive = np.asarray(slam.ms.kf_valid)[:n_kf]
    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf][alive]
    gt = Ts[fid]
    ate = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_kf][alive], gt)
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt])
    span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))

    out = {
        "frames": n, "laps": args.laps, "wall_s": round(wall, 1),
        "n_kf": n_kf, "n_loops": slam.loop_closer.n_loops,
        "n_gba_done": slam.n_gba_done, "n_growths": slam.n_growths,
        "kf_ate": round(float(ate), 4), "span": round(span, 2),
        "buckets": buckets,
    }
    print(json.dumps(out))
    ok = n_kf >= 800 and slam.loop_closer.n_loops >= 2
    print("RESULT:", "PASS" if ok else "FAIL (need >=800 KFs, >=2 loops)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
