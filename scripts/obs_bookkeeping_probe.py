"""Observation-count bookkeeping audit (ROADMAP accuracy lever #3).

The round-3 probes reported landmark `pt_n_obs` mean ~2.2 while the
`kf_pt_idx` incidence implied ~6.1 observations per landmark. Those counts
feed real policy: the probation cull drops points with `pt_n_obs <= 2`
(`mapping.cull_points`), local BA selection ranks by `pt_n_obs`
(`mapping.py: rank`), and tracking counts `pt_n_obs >= 3` points toward
its reference-KF quality signal. If the counter systematically undercounts
the true incidence, good landmarks are culled and under-ranked.

Loads the `map.npz` checkpoint from an `ab_ours.py` run and compares, per
landmark: stored `pt_n_obs` vs the recomputed incidence
`sum_k [kf_valid(k) & kp_valid(k,n) & kf_pt_idx(k,n)==p]` — the exact sum
`mapstate.observers_of_points` produces on device.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/obs_bookkeeping_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEQ = os.environ.get("SEQ_DIR", "/tmp/refseq2")


def main():
    z = np.load(os.path.join(SEQ, "ab_out", "map.npz"))
    pt_valid = z["pt_valid"]
    n_obs = z["pt_n_obs"]
    kf_valid = z["kf_valid"]
    kf_pt_idx = z["kf_pt_idx"]
    kp_valid = z["kf_kp_valid"] if "kf_kp_valid" in z else \
        np.ones(kf_pt_idx.shape, bool)
    P = len(pt_valid)

    inc = np.zeros(P, np.int64)
    for k in range(kf_pt_idx.shape[0]):
        if not kf_valid[k]:
            continue
        rows = kf_pt_idx[k]
        m = (rows >= 0) & kp_valid[k]
        np.add.at(inc, rows[m], 1)

    v = pt_valid
    diff = n_obs[v].astype(np.int64) - inc[v]
    print(f"valid landmarks={v.sum()}  "
          f"pt_n_obs mean={n_obs[v].mean():.2f}  "
          f"incidence mean={inc[v].mean():.2f}")
    print(f"exact agreement: {(diff == 0).mean() * 100:.1f}%  "
          f"overcount(>0): {(diff > 0).mean() * 100:.1f}%  "
          f"undercount(<0): {(diff < 0).mean() * 100:.1f}%")
    for q in (50, 90, 99):
        print(f"  |diff| p{q} = {np.percentile(np.abs(diff), q):.1f}")
    # where culls would differ: points the <=2 gate would kill under one
    # count but not the other
    gate_stored = n_obs[v] <= 2
    gate_true = inc[v] <= 2
    print(f"cull-gate disagreement (n_obs<=2 XOR incidence<=2): "
          f"{(gate_stored ^ gate_true).sum()} of {v.sum()}")


if __name__ == "__main__":
    main()
