"""Front-end observation-noise probe (round 3 accuracy diagnosis).

Measures the pixel-level noise of OUR detector+matcher against exact
ground-truth epipolar geometry on the photo head-to-head sequence, with
OpenCV's ORB (the reference's front end, FAST+octree+BRIEF) matched by
BFMatcher as the control. GBA and a wider BA window both measured WORSE
than the default on this sequence (scripts/ab_ours.py), and per-segment
scale noise is +-17% vs the reference's +-3% — the signature of landmark
depth noise, i.e. front-end localization error, not back-end schedule.
This probe separates the two: epipolar residual sigma under GT poses is
pure detector+matcher noise, independent of the SLAM stack.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/obs_noise_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

SEQ = os.environ.get("SEQ_DIR", "/tmp/refseq2")
K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
PAIRS = [(0, 6), (60, 66), (120, 126), (180, 186), (240, 246)]


def epipolar_stats(uv1, uv2, T1, T2):
    """Point-to-epipolar-line distance of each match under GT relative
    pose; returns the residual array (px, in image 2)."""
    T21 = T2 @ np.linalg.inv(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    h1 = np.concatenate([uv1, np.ones((len(uv1), 1))], 1)
    h2 = np.concatenate([uv2, np.ones((len(uv2), 1))], 1)
    l2 = (F @ h1.T).T                      # epipolar lines in image 2
    d = np.abs(np.sum(l2 * h2, 1)) / np.linalg.norm(l2[:, :2], axis=1)
    return d


def robust_sigma(d):
    return 1.4826 * np.median(np.abs(d - np.median(d)))


def ours(img1, img2):
    from plslam_tpu.ops import extract, hamming
    cfg = extract.ExtractorConfig(n_features=1024)
    f1 = extract.extract_points(jax.numpy.asarray(img1, jax.numpy.float32), cfg)
    f2 = extract.extract_points(jax.numpy.asarray(img2, jax.numpy.float32), cfg)
    D = np.asarray(hamming.distance_matrix(f2.desc, f1.desc)).astype(np.float32)
    v1 = np.asarray(f1.valid)
    v2 = np.asarray(f2.valid)
    D[~v2] = 1e9
    D[:, ~v1] = 1e9
    j = D.argmin(1)
    best = D[np.arange(len(j)), j]
    Ds = D.copy()
    Ds[np.arange(len(j)), j] = 1e9
    second = Ds.min(1)
    rev = D.argmin(0)
    ok = (best <= 50) & (best < 0.75 * second) & (rev[j] == np.arange(len(j)))
    uv2 = np.asarray(f2.uv)[ok]
    uv1 = np.asarray(f1.uv)[j[ok]]
    return uv1, uv2


def cv_orb(img1, img2):
    import cv2
    orb = cv2.ORB_create(nfeatures=1024, scaleFactor=1.2, nlevels=8,
                         fastThreshold=20)
    k1, d1 = orb.detectAndCompute(img1, None)
    k2, d2 = orb.detectAndCompute(img2, None)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    m = [x for x in bf.match(d2, d1) if x.distance <= 50]
    uv2 = np.array([k2[x.queryIdx].pt for x in m])
    uv1 = np.array([k1[x.trainIdx].pt for x in m])
    return uv1, uv2


def main():
    from plslam_tpu.datasets import tum
    gt = np.load(os.path.join(SEQ, "gt_Tcw.npy"))
    _, paths = tum.load_rgb_index(SEQ)
    idx = dict(enumerate(paths))
    import cv2
    for name, fn in [("ours", ours), ("cv2_orb", cv_orb)]:
        sigs, meds, ns = [], [], []
        for i, j in PAIRS:
            im1 = cv2.imread(idx[i], cv2.IMREAD_GRAYSCALE)
            im2 = cv2.imread(idx[j], cv2.IMREAD_GRAYSCALE)
            uv1, uv2 = fn(im1, im2)
            if len(uv1) < 20:
                continue
            d = epipolar_stats(uv1, uv2, gt[i], gt[j])
            keep = d < 5.0          # gross-outlier cut before the sigma
            sigs.append(robust_sigma(d[keep]))
            meds.append(np.median(d[keep]))
            ns.append(int(keep.sum()))
        print(f"{name:8} matches/pair={np.mean(ns):6.0f} "
              f"median residual={np.mean(meds):.3f} px  "
              f"robust sigma={np.mean(sigs):.3f} px", flush=True)


if __name__ == "__main__":
    main()
