"""Run the COMPILED C++ reference and this rebuild on the SAME on-disk
TUM-format photo-textured sequence, and measure both against the exact
ground truth — the BASELINE.json accuracy contract ("ATE RMSE within 5% of
the C++ reference") as a measured number instead of a self-referential one.

Pipeline (reference side mirrors `Examples/Monocular/mono_tum.cc:36-126`):
  1. render an orbit trajectory over the photo-textured scene
     (`plslam_tpu/datasets/textured.py`) and write it as rgb/ + rgb.txt;
  2. train a DBoW2 text-format vocabulary from the sequence's own frames
     with the reference's ORBextractor (tools/train_vocab, built into the
     headless reference build) — the reference repo ships no vocabulary;
  3. run the reference `mono_tum` (vocab, yaml, seq) -> KeyFrameTrajectory;
  4. run this rebuild's `examples/mono_tum.py` on the same files;
  5. Sim3-align each trajectory against the rendered ground truth and
     report ATE RMSE + per-frame tracking-time medians side by side.

Usage: python scripts/ref_compare.py [--frames N] [--out results.json]
Env:   REF_DIR  (default /tmp/refbuild/ref)  — headless reference build
       SEQ_DIR  (default /tmp/refseq)        — sequence cache (reused)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DIR = os.environ.get("REF_DIR", "/tmp/refbuild/ref")
SEQ_DIR = os.environ.get("SEQ_DIR", "/tmp/refseq")


def render_sequence(n: int, fx: float = 500.0, amplitude: float = 3.0,
                    z_offset: float = 4.5, traj: str = "orbit",
                    layout: str = "open") -> None:
    """Render the head-to-head sequence.

    z_offset moves the camera toward the back wall (world +z): the room's
    walls sit ~9 m from the origin, and a monocular tracker at fx=500 with
    ~1.7 cm/frame baseline gets a baseline-to-depth ratio of ~0.002 there —
    below even the reference's own creation gate (`LocalMapping.cc:
    CreateNewMapPoints` skips pairs with baseline/medianDepth < 0.01), so
    BOTH systems starve and die mid-sequence (measured: each produced
    exactly 23 KFs then lost tracking for good). At ~4.5 m of scene depth
    the same motion is properly conditioned and the comparison measures
    tracking quality instead of a degenerate geometry."""
    from plslam_tpu.datasets import synthetic, textured
    os.makedirs(SEQ_DIR, exist_ok=True)
    # SCENE_SEED varies the plane texturing/layout — the multi-sequence
    # protocol (scripts/multirun.py) renders several seeds because
    # single-run ATE on one sequence has a measured ~2x chaos floor
    seed = int(os.environ.get("SCENE_SEED", "5"))
    variant = "" if (traj, layout) == ("orbit", "open") else f"_{traj}_{layout}"
    stamp = os.path.join(
        SEQ_DIR, f"done_{n}_{amplitude}_{z_offset}_s{seed}{variant}")
    legacy = os.path.join(SEQ_DIR, f"done_{n}_{amplitude}_{z_offset}")
    if os.path.exists(stamp) or (
            seed == 5 and not variant and os.path.exists(legacy)):
        return
    scene = textured.make_photo_scene(seed=seed, fx=fx, fy=fx, layout=layout)
    Ts = synthetic.trajectory(n, traj, amplitude=amplitude)
    if z_offset:
        for T in Ts:
            T[:3, 3] -= T[:3, :3] @ np.array([0.0, 0.0, z_offset], T.dtype)
    frames = [synthetic.render(scene, T) for T in Ts]
    tss = [i / 30.0 for i in range(n)]
    textured.write_tum_sequence(SEQ_DIR, frames, tss)
    np.save(os.path.join(SEQ_DIR, "gt_Tcw.npy"), np.stack(Ts))
    yaml = f"""%YAML:1.0
Camera.fx: {fx}
Camera.fy: {fx}
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.k3: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LINEextractor.nLevels: 1
LINEextractor.scaleFactor: 1.2
LINEextractor.nFeatures: 128
LINEextractor.min_line_length: 0
Viewer.KeyFrameSize: 0.05
Viewer.KeyFrameLineWidth: 1
Viewer.GraphLineWidth: 0.9
Viewer.PointSize: 2
Viewer.CameraSize: 0.08
Viewer.CameraLineWidth: 3
Viewer.ViewpointX: 0
Viewer.ViewpointY: -0.7
Viewer.ViewpointZ: -1.8
Viewer.ViewpointF: 500
Viewer.LineWidth: 1.5
"""
    with open(os.path.join(SEQ_DIR, "settings.yaml"), "w") as f:
        f.write(yaml)
    open(stamp, "w").close()


def train_vocab() -> str:
    voc = os.path.join(SEQ_DIR, "voc.txt")
    if not os.path.exists(voc):
        tool = os.path.join(REF_DIR, "tools", "train_vocab")
        subprocess.run([tool, os.path.join(SEQ_DIR, "rgb"), voc, "10", "4"],
                       check=True)
    return voc


def sim3_ate(est_c: np.ndarray, gt_c: np.ndarray) -> float:
    mu_e, mu_g = est_c.mean(0), gt_c.mean(0)
    E, G = est_c - mu_e, gt_c - mu_g
    U, D, Vt = np.linalg.svd(G.T @ E)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = (D * np.diag(S)).sum() / max((E * E).sum(), 1e-12)
    return float(np.sqrt(
        (np.linalg.norm((s * (R @ E.T)).T - G, axis=1) ** 2).mean()))


def eval_traj(path: str, n: int):
    """ATE RMSE of a TUM-format trajectory vs the rendered ground truth.

    Timestamps are matched by nearest frame index (round(ts*fps)): the
    reference's SaveKeyFrameTrajectoryTUM prints 6 SIGNIFICANT digits
    (`setprecision(6)`, Examples/Monocular/mono_tum.cc), so ts >= 1.0 s
    loses decimals and exact string/rounding matches silently drop poses.
    """
    Ts = np.load(os.path.join(SEQ_DIR, "gt_Tcw.npy"))
    rows = [l.split() for l in open(path) if l.strip() and l[0] != "#"]
    by_idx = {}
    for r in rows:
        ts = float(r[0])
        i = int(round(ts * 30.0))
        if 0 <= i < n and abs(ts - i / 30.0) < 2e-3:
            by_idx[i] = np.array([float(v) for v in r[1:4]])
    idx = sorted(by_idx)
    if len(idx) < 8:
        return None, len(idx)
    est_c = np.stack([by_idx[i] for i in idx])
    gt_c = np.stack([-Ts[i][:3, :3].T @ Ts[i][:3, 3] for i in idx])
    span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    # relative segment error per meter of GT path — a local-drift metric
    # with far less run-to-run chaos than ATE (ATE integrates where drift
    # happens along the loop; segment errors do not)
    mu_e, mu_g = est_c.mean(0), gt_c.mean(0)
    E, G = est_c - mu_e, gt_c - mu_g
    U, D, Vt = np.linalg.svd(G.T @ E)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    s = (D * np.diag(S)).sum() / max((E * E).sum(), 1e-12)
    al = (s * ((U @ S @ Vt) @ E.T)).T
    seg_err = np.linalg.norm(np.diff(al, axis=0) - np.diff(G, axis=0),
                             axis=1)
    path = np.linalg.norm(np.diff(G, axis=0), axis=1).sum()
    return {"ate": sim3_ate(est_c, gt_c), "span": span,
            "drift_per_m": float(seg_err.sum() / max(path, 1e-9)),
            "n_poses": len(idx), "first_frame": idx[0],
            "last_frame": idx[-1]}, len(idx)


def run_reference(voc: str, n: int):
    exe = os.path.join(REF_DIR, "Examples", "Monocular", "mono_tum")
    t0 = time.perf_counter()
    p = subprocess.run(
        [exe, voc, os.path.join(SEQ_DIR, "settings.yaml"), SEQ_DIR],
        cwd=SEQ_DIR, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0
    sys.stdout.write(p.stdout[-2000:])
    sys.stderr.write(p.stderr[-2000:])
    with open(os.path.join(SEQ_DIR, "ref_stdout.log"), "w") as f:
        f.write(p.stdout)
    med = mean = None
    n_loops = 0
    for line in p.stdout.splitlines():
        if "median tracking time" in line:
            med = float(line.split(":")[1])
        if "mean tracking time" in line:
            mean = float(line.split(":")[1])
        if "Loop detected!" in line:   # src/LoopClosing.cc:404
            n_loops += 1
    # preserve the reference's keyframe file: the rebuild side also writes a
    # KeyFrameTrajectory.txt into its cwd and must not clobber this one
    kf_ref = os.path.join(SEQ_DIR, "RefKeyFrameTrajectory.txt")
    os.replace(os.path.join(SEQ_DIR, "KeyFrameTrajectory.txt"), kf_ref)
    res, _ = eval_traj(kf_ref, n)
    return {"rc": p.returncode, "wall_s": wall, "n_loops": n_loops,
            "median_track_s": med, "mean_track_s": mean, "traj": res}


def run_ours(n: int):
    import examples.mono_tum as mono_tum
    out_dir = os.path.join(SEQ_DIR, "ours_out")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "OursTrajectory.txt")
    argv, cwd = sys.argv, os.getcwd()
    t0 = time.perf_counter()
    try:
        os.chdir(out_dir)
        sys.argv = ["mono_tum.py", os.path.join(SEQ_DIR, "settings.yaml"),
                    SEQ_DIR, out]
        rc = mono_tum.main()
    finally:
        sys.argv, _ = argv, os.chdir(cwd)
    wall = time.perf_counter() - t0
    res, _ = eval_traj(out, n)
    kf_res, _ = eval_traj(os.path.join(out_dir, "KeyFrameTrajectory.txt"), n)
    stats = {}
    stats_path = os.path.join(out_dir, "mono_tum_stats.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
    return {"rc": rc, "wall_s": wall, "traj": res, "kf_traj": kf_res,
            **{k: stats[k] for k in ("n_loops", "n_kf", "n_gba_done",
                                     "median_track_s") if k in stats}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--amplitude", type=float, default=3.0)
    ap.add_argument("--z-offset", type=float, default=4.5,
                    help="move the camera this far toward the back wall "
                         "(see render_sequence docstring). Use 0 with "
                         "--traj circle (z there is radially outward)")
    ap.add_argument("--traj", default="orbit",
                    choices=["orbit", "loop", "circle", "forward", "sweeps"],
                    help="trajectory kind; 'circle' + --layout room is the "
                         "photo-realistic loop-closure fixture")
    ap.add_argument("--layout", default="open", choices=["open", "room"])
    ap.add_argument("--out", default=os.path.join(SEQ_DIR, "compare.json"))
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for the rebuild side "
                         "(same host the reference binary ran on)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    print(f"rendering {args.frames} frames -> {SEQ_DIR}", flush=True)
    render_sequence(args.frames, amplitude=args.amplitude,
                    z_offset=args.z_offset, traj=args.traj,
                    layout=args.layout)
    results = {"frames": args.frames}
    if os.path.exists(args.out):
        # merge with a prior partial run (e.g. --skip-ours then --skip-ref)
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("frames") == args.frames:
            results.update({k: v for k, v in prev.items() if k != "frames"})
    if not args.skip_ref:
        voc = train_vocab()
        print("running C++ reference mono_tum ...", flush=True)
        results["reference"] = run_reference(voc, args.frames)
        print(json.dumps(results["reference"], indent=1), flush=True)
    if not args.skip_ours:
        print("running rebuild examples/mono_tum.py ...", flush=True)
        results["ours"] = run_ours(args.frames)
        print(json.dumps(results["ours"], indent=1), flush=True)
    ref_t = (results.get("reference") or {}).get("traj")
    ours = results.get("ours") or {}
    # apples-to-apples: the reference only exports keyframe poses
    # (mono_tum.cc calls SaveKeyFrameTrajectoryTUM), so the headline ratio
    # compares keyframe trajectories; the full per-frame ATE is reported too
    our_t = ours.get("kf_traj") or ours.get("traj")
    if ref_t and our_t:
        results["ate_ratio_ours_over_ref"] = our_t["ate"] / max(
            ref_t["ate"], 1e-12)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
