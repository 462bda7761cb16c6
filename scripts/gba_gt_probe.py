"""Decisive back-end bias probe: run OUR global BA starting from ground
truth.

Round-3 measurements on the photo head-to-head sequence: a final global
BA makes keyframe ATE WORSE (0.0346 vs 0.0269), and so does widening the
local BA window — the signature of a systematic inconsistency between the
stored observations and the geometry, not of random noise. This probe
separates "biased observations / biased solver" from "bad landmark graph":

1. load the ab_ours map checkpoint (ab_out/map.npz),
2. overwrite every keyframe pose with the rendered GROUND TRUTH pose,
3. re-triangulate every landmark by DLT from its own stored observations
   under those GT poses (skipping <2-view landmarks),
4. run the production global-BA program,
5. report keyframe ATE before (=0 by construction) and after.

If ATE after is at observation-noise level (~1 mm here), the solver and
the stored (kf_uv, kf_octave) observations are unbiased, and the 4x gap
lives in the landmark graph / front-to-back pipeline. If ATE after is
macroscopic, the bias is in the measurement model itself.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/gba_gt_probe.py [--rounds 6]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

SEQ = os.environ.get("SEQ_DIR", "/tmp/refseq2")
FPS = 30.0


def main():
    rounds = 6
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    import jax.numpy as jnp
    from plslam_tpu.models.system import System, SLAMConfig
    from plslam_tpu.mapstate import checkpoint

    gt = np.load(os.path.join(SEQ, "gt_Tcw.npy"))
    ms = checkpoint.load_map(os.path.join(SEQ, "ab_out", "map.npz"))
    n_kf = int(ms.n_kf)
    rows = [l.split() for l in open(os.path.join(SEQ, "ab_out", "KFTraj.txt"))]
    fids = [int(round(float(r[0]) * FPS)) for r in rows if len(r) == 8][:n_kf]

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
    gt_T = gt[fids]                                     # (n_kf, 4, 4) Tcw

    # DLT re-triangulation of every landmark from its stored observations
    kf_pt = np.asarray(ms.kf_pt_idx)[:n_kf]
    kf_uv = np.asarray(ms.kf_uv)[:n_kf]
    kf_ok = np.asarray(ms.kf_valid)[:n_kf]
    P = np.asarray(ms.pt_valid).shape[0]
    obs_by_pt: dict = {}
    for k in range(n_kf):
        if not kf_ok[k]:
            continue
        sel = kf_pt[k] >= 0
        for slot in np.nonzero(sel)[0]:
            obs_by_pt.setdefault(int(kf_pt[k][slot]), []).append(
                (k, kf_uv[k][slot]))

    Pmat = np.array([K @ T[:3] for T in gt_T])          # (n_kf, 3, 4)
    xyz = np.asarray(ms.pt_xyz).copy()
    valid = np.asarray(ms.pt_valid).copy()
    n_tri = 0
    for p, obs in obs_by_pt.items():
        if not valid[p]:
            continue
        if len(obs) < 2:
            valid[p] = False
            continue
        A = []
        for k, uv in obs:
            Pm = Pmat[k]
            A.append(uv[0] * Pm[2] - Pm[0])
            A.append(uv[1] * Pm[2] - Pm[1])
        _, _, Vt = np.linalg.svd(np.array(A))
        X = Vt[-1]
        if abs(X[3]) < 1e-12:
            valid[p] = False
            continue
        xyz[p] = X[:3] / X[3]
        n_tri += 1
    # drop never-observed / single-view points from the problem
    ever = np.zeros(P, bool)
    for p in obs_by_pt:
        ever[p] = len(obs_by_pt[p]) >= 2
    valid &= ever

    cfg = SLAMConfig.from_yaml(os.path.join(SEQ, "settings.yaml"))
    slam = System(cfg)
    ms = ms._replace(
        kf_T=jnp.asarray(np.concatenate(
            [gt_T, np.asarray(ms.kf_T)[n_kf:]])),
        pt_xyz=jnp.asarray(xyz),
        pt_valid=jnp.asarray(valid),
        ln_valid=jnp.zeros_like(ms.ln_valid),   # points-only: isolate the
        # point measurement model first
    )
    slam.ms = ms
    slam.n_kf_host = n_kf

    def kf_ate():
        est = np.asarray(slam.ms.kf_T)[:n_kf]
        est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est])
        gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt_T])
        # similarity alignment (monocular gauge)
        mu_e, mu_g = est_c.mean(0), gt_c.mean(0)
        E, G = est_c - mu_e, gt_c - mu_g
        U, S, Vt = np.linalg.svd(E.T @ G / len(E))
        D = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            D[2, 2] = -1
        R = (U @ D @ Vt).T
        s = np.trace(np.diag(S) @ D) / ((E ** 2).sum() / len(E))
        t = mu_g - s * R @ mu_e
        al = s * (R @ est_c.T).T + t
        return float(np.sqrt(((al - gt_c) ** 2).sum(1).mean()))

    print(f"landmarks re-triangulated: {n_tri}; in problem: {valid.sum()}")
    print(f"kf ATE at GT init: {kf_ate()*1000:.2f} mm")
    for r in range(rounds):
        slam.run_global_ba()
        print(f"after GBA pass {r+1}: kf ATE {kf_ate()*1000:.2f} mm",
              flush=True)


if __name__ == "__main__":
    main()
