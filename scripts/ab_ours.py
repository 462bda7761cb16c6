"""A/B accuracy harness on the head-to-head photo sequence.

Runs ONLY the rebuild side of scripts/ref_compare.py's comparison with
arbitrary SLAMConfig field overrides, against the cached on-disk sequence
(SEQ_DIR, default /tmp/refseq2 — render it once with ref_compare.py), and
prints keyframe + full-trajectory ATE as one JSON line. This is the
measurement loop behind every entry in docs/ROADMAP.md's accuracy ladder.

Usage:
  SEQ_DIR=/tmp/refseq2 python scripts/ab_ours.py --cpu [--frames 300] \
      [key=value ...]           # e.g. subpixel=1 kf_min_interval=8
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ref_compare  # noqa: E402  (sibling script; shares SEQ_DIR + eval)


def parse_overrides(pairs, cfg_cls):
    fields = {f.name: f.type for f in dataclasses.fields(cfg_cls)}
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        if k not in fields:
            raise SystemExit(f"unknown SLAMConfig field: {k}")
        t = fields[k]
        if t in (bool, "bool"):
            out[k] = bool(int(v))
        elif t in (int, "int"):
            out[k] = int(v)
        elif t in (float, "float"):
            out[k] = float(v)
        else:
            out[k] = v
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    ref_compare.render_sequence(args.frames)

    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.datasets import tum

    cfg = SLAMConfig.from_yaml(os.path.join(ref_compare.SEQ_DIR,
                                            "settings.yaml"))
    # harness-level options (not SLAMConfig fields)
    raw = list(args.overrides)
    final_gba = 0
    for p in list(raw):
        if p.startswith("final_gba="):
            final_gba = int(p.split("=", 1)[1])
            raw.remove(p)
    ov = parse_overrides(raw, SLAMConfig)
    cfg = dataclasses.replace(cfg, **ov)
    slam = System(cfg)

    t0 = time.perf_counter()
    n_run = 0
    for ts, img in tum.frames(ref_compare.SEQ_DIR):
        slam.track_monocular(img, ts)
        n_run += 1
        if n_run >= args.frames:
            break
    slam.flush()
    for _ in range(final_gba):
        slam.run_global_ba()   # offline-refinement mode: N final GBA passes
    slam.shutdown()
    wall = time.perf_counter() - t0

    out_dir_early = os.path.join(ref_compare.SEQ_DIR, "ab_out")
    os.makedirs(out_dir_early, exist_ok=True)
    slam.save_map(os.path.join(out_dir_early, "map.npz"))  # for the
    # landmark-error probe (scripts/landmark_error_probe.py)

    out_dir = os.path.join(ref_compare.SEQ_DIR, "ab_out")
    os.makedirs(out_dir, exist_ok=True)
    traj = os.path.join(out_dir, "Traj.txt")
    kf_traj = os.path.join(out_dir, "KFTraj.txt")
    slam.save_trajectory_tum(traj)
    slam.save_keyframe_trajectory_tum(kf_traj)
    res, _ = ref_compare.eval_traj(traj, args.frames)
    kf_res, _ = ref_compare.eval_traj(kf_traj, args.frames)
    ms = slam.ms
    import numpy as np
    pt_valid = np.asarray(ms.pt_valid)
    n_obs = np.asarray(ms.pt_n_obs)[pt_valid]
    map_stats = {
        "n_pt": int(pt_valid.sum()),
        "n_ln": int(np.asarray(ms.ln_valid).sum()),
        "pt_obs_mean": round(float(n_obs.mean()), 2) if len(n_obs) else 0,
        "pt_obs_p90": int(np.percentile(n_obs, 90)) if len(n_obs) else 0,
    }
    inl = [s["inliers"] for s in slam.stats if not s.get("lost")]
    ln_inl = [s.get("line_inliers", 0) for s in slam.stats
              if not s.get("lost")]
    print(json.dumps({
        "overrides": {**ov, **({"final_gba": final_gba} if final_gba else {})},
        "frames": n_run, "wall_s": round(wall, 1),
        "kf_ate": kf_res and round(kf_res["ate"], 5),
        "kf_drift_per_m": kf_res and round(kf_res.get("drift_per_m", -1), 5),
        "kf_poses": kf_res and kf_res["n_poses"],
        "ate": res and round(res["ate"], 5),
        "drift_per_m": res and round(res.get("drift_per_m", -1), 5),
        "poses": res and res["n_poses"],
        "mean_inliers": inl and round(sum(inl) / len(inl), 1),
        "mean_line_inliers": ln_inl and round(sum(ln_inl) / len(ln_inl), 1),
        "n_kf_made": sum(1 for s in slam.stats if s.get("kf")),
        **map_stats,
        # compact per-frame diagnostics for run profiling (variance hunt)
        "frame_inliers": [int(s.get("inliers", -1)) for s in slam.stats],
        "frame_kf": [1 if s.get("kf") else 0 for s in slam.stats],
        "ref_kf_ate": 0.00679,  # compare.json reference row, same sequence
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
