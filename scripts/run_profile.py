"""Profile one ab_ours run: where along the trajectory does the error
live, and what tracking events coincide with it?

Reads the run JSON (with frame_inliers/frame_kf diagnostics), the saved
trajectories, and the sequence ground truth; prints a per-15-frame text
profile: Sim3-aligned position error, inlier count, keyframe events.
Used to hunt the run-to-run ATE variance (BASELINE.md round-3 caveat):
a localized error bump pinpoints the frames whose landmarks/events to
inspect.

Usage: python scripts/run_profile.py <run.json> <Traj.txt> <seq_dir>
"""
import json
import os
import sys

import numpy as np


def main():
    run_json, traj_path, seq = sys.argv[1:4]
    with open(run_json) as f:
        run = json.load(f)
    gt = np.load(os.path.join(seq, "gt_Tcw.npy"))
    by = {}
    for l in open(traj_path):
        if not l.strip() or l[0] == "#":
            continue
        r = l.split()
        i = int(round(float(r[0]) * 30.0))
        by[i] = np.array([float(v) for v in r[1:4]])
    idx = sorted(by)
    est = np.stack([by[i] for i in idx])
    gtc = np.stack([-gt[i][:3, :3].T @ gt[i][:3, 3] for i in idx])
    mu_e, mu_g = est.mean(0), gtc.mean(0)
    E, G = est - mu_e, gtc - mu_g
    U, D, Vt = np.linalg.svd(G.T @ E)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    s = (D * np.diag(S)).sum() / max((E * E).sum(), 1e-12)
    al = (s * ((U @ S @ Vt) @ E.T)).T
    err = np.linalg.norm(al - G, axis=1)

    inl = run.get("frame_inliers", [])
    kf = run.get("frame_kf", [])
    print(f"{run_json}: kf_ate={run.get('kf_ate')} n={len(idx)} poses")
    B = 15
    for lo in range(0, len(idx), B):
        sl = slice(lo, min(lo + B, len(idx)))
        fr = idx[sl.start], idx[min(sl.stop, len(idx)) - 1]
        e = err[sl]
        fi = [inl[i] for i in idx[sl] if i < len(inl)]
        nk = sum(kf[i] for i in idx[sl] if i < len(kf))
        bar = "#" * int(np.mean(e) * 400)
        print(f"f{fr[0]:3}-{fr[1]:3}: err mean={np.mean(e)*100:5.1f}cm "
              f"max={np.max(e)*100:5.1f} inl={np.mean(fi) if fi else -1:5.0f} "
              f"kfs={nk} {bar}")


if __name__ == "__main__":
    main()
