"""Landmark-quality probe: where does the map's depth error come from?

Loads the map checkpoint written by scripts/ab_ours.py (ab_out/map.npz),
Sim3-aligns the estimated keyframe trajectory to the rendered ground
truth, transforms every landmark into GT coordinates, and reprojects it
into its observing keyframes' GT poses. The residual against the STORED
observations (kf_uv) is then (observation noise) + (landmark position
error projected at that view) with all pose error removed — bucketed by
the landmark's creation keyframe span and observation count it localizes
whether the ~4x ATE gap vs the C++ reference is landmark depth error,
and from which triangulation regime.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/landmark_error_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQ = os.environ.get("SEQ_DIR", "/tmp/refseq2")
K_int = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
FPS = 30.0


def sim3_fit(est, gt):
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(E.T @ G / len(est))
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = (U @ D @ Vt).T
    s = np.trace(np.diag(S) @ D) / ((E ** 2).sum() / len(est))
    t = mu_g - s * R @ mu_e
    return s, R, t


def main():
    z = np.load(os.path.join(SEQ, "ab_out", "map.npz"))
    gt = np.load(os.path.join(SEQ, "gt_Tcw.npy"))          # (n, 4, 4)
    kf_valid = z["kf_valid"]
    n_kf = int(z["n_kf"])
    kf_T = z["kf_T"][:n_kf]                                 # est Tcw
    kf_ts = z["kf_ts"][:n_kf] if "kf_ts" in z else None
    if kf_ts is None:
        # keyframe timestamps are not in the checkpoint; recover frame ids
        # from the KF trajectory file written by the same ab run
        rows = [l.split() for l in
                open(os.path.join(SEQ, "ab_out", "KFTraj.txt"))]
        fids = [int(round(float(r[0]) * FPS)) for r in rows if len(r) == 8]
    else:
        fids = [int(round(t * FPS)) for t in kf_ts]
    assert len(fids) >= n_kf - 1, (len(fids), n_kf)
    fids = fids[:n_kf]

    # Sim3: estimated KF centers -> GT centers
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in kf_T])
    gt_T = gt[fids]
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt_T])
    s, R, t = sim3_fit(est_c, gt_c)

    pt_valid = z["pt_valid"]
    X = z["pt_xyz"]                                         # map frame
    Xg = s * (R @ X.T).T + t                                # GT frame
    first_kf = z["pt_first_kf"]
    n_obs = z["pt_n_obs"]

    kf_pt_idx = z["kf_pt_idx"][:n_kf]
    kf_uv = z["kf_uv"][:n_kf]

    # reproject into each observing keyframe under the GT pose
    res_by_pt = {}
    for k in range(n_kf):
        if not kf_valid[k]:
            continue
        obs = kf_pt_idx[k] >= 0
        pid = kf_pt_idx[k][obs]
        ok = pt_valid[pid]
        pid, uv = pid[ok], kf_uv[k][obs][ok]
        Tc = gt_T[k]
        Xc = (Tc[:3, :3] @ Xg[pid].T).T + Tc[:3, 3]
        zc = np.maximum(Xc[:, 2], 1e-6)
        proj = (K_int @ (Xc / zc[:, None]).T).T[:, :2]
        r = np.linalg.norm(proj - uv, axis=1)
        for p, e in zip(pid, r):
            res_by_pt.setdefault(int(p), []).append(float(e))

    all_r = np.array([e for v in res_by_pt.values() for e in v])
    print(f"landmarks={int(pt_valid.sum())} obs={len(all_r)} "
          f"residual px p50={np.percentile(all_r, 50):.2f} "
          f"p90={np.percentile(all_r, 90):.2f} "
          f"p99={np.percentile(all_r, 99):.2f}")

    # bucket landmark mean residual by creation keyframe and by n_obs
    pts = sorted(res_by_pt)
    mean_r = np.array([np.mean(res_by_pt[p]) for p in pts])
    fk = first_kf[pts]
    no = n_obs[pts]
    for lo, hi in [(0, 2), (2, 3), (3, 5), (5, 9), (9, 100)]:
        m = (no >= lo) & (no < hi)
        if m.sum() == 0:
            continue
        print(f"  n_obs [{lo:2},{hi:3}): n={m.sum():5} "
              f"mean residual p50={np.percentile(mean_r[m], 50):.2f} "
              f"p90={np.percentile(mean_r[m], 90):.2f}")
    # by creation epoch (early/mid/late map)
    for lo, hi in [(0, 10), (10, 25), (25, 100)]:
        m = (fk >= lo) & (fk < hi)
        if m.sum() == 0:
            continue
        print(f"  first_kf [{lo:2},{hi:3}): n={m.sum():5} "
              f"mean residual p50={np.percentile(mean_r[m], 50):.2f} "
              f"p90={np.percentile(mean_r[m], 90):.2f}")


if __name__ == "__main__":
    main()
