"""Decompose the match-density gap vs OpenCV ORB (ROADMAP accuracy lever #2).

`obs_noise_probe.py` measured 393 matches/pair (ours) vs 687 (cv2 ORB) on
the head-to-head photo sequence — but its two sides used DIFFERENT gates
(ours added a 0.75 ratio test). This probe applies IDENTICAL gate stacks to
both detectors so the gap decomposes into:

  1. detection capacity  — valid keypoints per frame;
  2. descriptor match    — cross-check + abs<=50 matches (same gates);
  3. ratio-test survival — + best < 0.75 * second;
  4. geometric quality   — epipolar inliers (<2 px under GT geometry)
                           at each stage.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/match_density_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

import numpy as np  # noqa: E402

SEQ = os.environ.get("SEQ_DIR", "/tmp/refseq2")
K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
PAIRS = [(0, 6), (60, 66), (120, 126), (180, 186), (240, 246)]


def epi_dist(uv1, uv2, T1, T2):
    T21 = T2 @ np.linalg.inv(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
    h1 = np.concatenate([uv1, np.ones((len(uv1), 1))], 1)
    h2 = np.concatenate([uv2, np.ones((len(uv2), 1))], 1)
    l2 = (F @ h1.T).T
    return np.abs(np.sum(l2 * h2, 1)) / np.linalg.norm(l2[:, :2], axis=1)


def ours_feats(img):
    from plslam_tpu.ops import extract
    cfg = extract.ExtractorConfig(n_features=1024)
    f = extract.extract_points(jax.numpy.asarray(img, jax.numpy.float32), cfg)
    v = np.asarray(f.valid)
    # unpack bit desc -> packed bytes for numpy Hamming
    return np.asarray(f.uv)[v], np.asarray(f.desc)[v]


def cv_feats(img):
    import cv2
    orb = cv2.ORB_create(nfeatures=1024, scaleFactor=1.2, nlevels=8,
                         fastThreshold=20)
    kps, desc = orb.detectAndCompute(img, None)
    uv = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    return uv, desc


def ham_ours(d2, d1):
    # (N,256) uint8 bits each side
    return (d2[:, None, :] != d1[None, :, :]).sum(-1).astype(np.int32)


def ham_cv(d2, d1):
    bits = np.unpackbits(d2[:, None, :] ^ d1[None, :, :], axis=-1)
    return bits.sum(-1).astype(np.int32)


def stages(uv1, uv2_all, D, T1, T2):
    """D: (N2, N1) distances. Returns dict of per-stage counts."""
    j = D.argmin(1)
    best = D[np.arange(len(j)), j]
    Ds = D.copy()
    Ds[np.arange(len(j)), j] = 10 ** 9
    second = Ds.min(1)
    rev = D.argmin(0)
    cc = (best <= 50) & (rev[j] == np.arange(len(j)))
    ratio = cc & (best < 0.75 * second)
    out = {}
    for name, m in [("crosscheck50", cc), ("ratio", ratio)]:
        if m.sum() < 8:
            out[name] = (int(m.sum()), 0)
            continue
        d = epi_dist(uv1[j[m]], uv2_all[m], T1, T2)
        out[name] = (int(m.sum()), int((d < 2.0).sum()))
    return out


def main():
    from plslam_tpu.datasets import tum
    import cv2
    gt = np.load(os.path.join(SEQ, "gt_Tcw.npy"))
    _, paths = tum.load_rgb_index(SEQ)
    acc = {}
    nvalid = {"ours": [], "cv2": []}
    for i, jdx in PAIRS:
        im1 = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
        im2 = cv2.imread(paths[jdx], cv2.IMREAD_GRAYSCALE)
        for name, fe, hd in [("ours", ours_feats, ham_ours),
                             ("cv2", cv_feats, ham_cv)]:
            uv1, d1 = fe(im1)
            uv2, d2 = fe(im2)
            nvalid[name] += [len(uv1), len(uv2)]
            st = stages(uv1, uv2, hd(d2, d1), gt[i], gt[jdx])
            for k, v in st.items():
                acc.setdefault((name, k), []).append(v)
    for name in ("ours", "cv2"):
        line = f"{name:5} valid_feats={np.mean(nvalid[name]):6.0f}"
        for k in ("crosscheck50", "ratio"):
            ns = np.array(acc[(name, k)])
            line += (f"  {k}: n={ns[:, 0].mean():5.0f} "
                     f"epi_inl={ns[:, 1].mean():5.0f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
