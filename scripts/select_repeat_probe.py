"""Selection-repeatability sweep (VERDICT r4 item 3 — the measured root of
the accuracy gap).

The reference's `ORBextractor::DistributeOctTree`
(`/root/reference/src/ORBextractor.cc:539-763`) keeps the best-response
corner per adaptive quadtree node: spatially uniform AND response-stable
(the selected SET barely changes between nearby views). Our
champion-per-cell-first ordering measured 30% selected-set repeatability
@1.5px vs cv2 ORB's 75-80%, costing ~35% of cross-view matches.

This probe renders a photo-textured orbit WITH DEPTH (exact ground-truth
correspondence via unproject->reproject) and measures, per selection
config:

  repeat  — fraction of view-1 keypoints whose GT reprojection into view-2
            has a selected view-2 keypoint within 1.5 px (level-0 coords);
  cells   — occupied 32-px cells in view 2 (spatial coverage);
  cc50 / epi — identical-gate match stages (mutual NN + Hamming<=50,
            + ratio 0.75) and their epipolar inliers <2 px under GT.

Usage: python scripts/select_repeat_probe.py [--pairs 5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from plslam_tpu.datasets import synthetic, textured  # noqa: E402

FX = 500.0
K = np.array([[FX, 0, 320.0], [0, FX, 240.0], [0, 0, 1]])
GAP = 6


def render_pairs(n_pairs, seed=5):
    scene = textured.make_photo_scene(seed=seed, fx=FX, fy=FX, layout="open")
    n = n_pairs * 60
    Ts = synthetic.trajectory(max(n, 60), "orbit", amplitude=3.0)
    for T in Ts:
        T[:3, 3] -= T[:3, :3] @ np.array([0.0, 0.0, 4.5], T.dtype)
    out = []
    for p in range(n_pairs):
        i = p * 60
        im1, z1 = synthetic.render_rgbd(scene, Ts[i])
        im2, _ = synthetic.render_rgbd(scene, Ts[i + GAP])
        out.append((im1, z1, im2, Ts[i], Ts[i + GAP]))
    return out


def gt_reproject(uv1, z1, T1, T2):
    """Map view-1 pixels to view-2 pixels through the depth map. Returns
    (uv2_gt, ok) — ok False where depth is invalid."""
    xi = np.clip(np.round(uv1[:, 0]).astype(int), 0, z1.shape[1] - 1)
    yi = np.clip(np.round(uv1[:, 1]).astype(int), 0, z1.shape[0] - 1)
    z = z1[yi, xi]
    ok = np.isfinite(z) & (z > 0.01) & (z < 100.0)
    pts_c1 = np.linalg.solve(K, np.concatenate(
        [uv1, np.ones((len(uv1), 1))], 1).T).T * z[:, None]
    T21 = T2 @ np.linalg.inv(T1)
    pts_c2 = pts_c1 @ T21[:3, :3].T + T21[:3, 3]
    ok &= pts_c2[:, 2] > 0.05
    uv2 = (pts_c2 @ K.T)
    uv2 = uv2[:, :2] / np.maximum(uv2[:, 2:3], 1e-9)
    return uv2, ok


def ours_feats(img, order, cap, pattern="gauss"):
    from plslam_tpu.ops import extract
    cfg = extract.ExtractorConfig(n_features=1024, sel_order=order,
                                  sel_cap=cap, desc_pattern=pattern)
    f = extract.extract_points(jax.numpy.asarray(img, jax.numpy.float32),
                               cfg)
    v = np.asarray(f.valid)
    return np.asarray(f.uv)[v], np.asarray(f.desc)[v]


def cv_feats(img, *_):
    import cv2
    orb = cv2.ORB_create(nfeatures=1024, scaleFactor=1.2, nlevels=8,
                         fastThreshold=20)
    kps, desc = orb.detectAndCompute(img.astype(np.uint8), None)
    uv = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    bits = np.unpackbits(desc, axis=1) if desc is not None else None
    return uv, bits


def epi_dist(uv1, uv2, T1, T2):
    T21 = T2 @ np.linalg.inv(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
    h1 = np.concatenate([uv1, np.ones((len(uv1), 1))], 1)
    h2 = np.concatenate([uv2, np.ones((len(uv2), 1))], 1)
    l2 = (F @ h1.T).T
    return np.abs(np.sum(l2 * h2, 1)) / np.linalg.norm(l2[:, :2], axis=1)


def match_stages(uv1, d1, uv2, d2, T1, T2):
    D = (d2[:, None, :] != d1[None, :, :]).sum(-1).astype(np.int32)
    j = D.argmin(1)
    best = D[np.arange(len(j)), j]
    Ds = D.copy()
    Ds[np.arange(len(j)), j] = 10 ** 9
    second = Ds.min(1)
    rev = D.argmin(0)
    cc = (best <= 50) & (rev[j] == np.arange(len(j)))
    ratio = cc & (best < 0.75 * second)
    out = []
    for m in (cc, ratio):
        if m.sum() < 8:
            out += [int(m.sum()), 0]
            continue
        d = epi_dist(uv1[j[m]], uv2[m], T1, T2)
        out += [int(m.sum()), int((d < 2.0).sum())]
    return out  # [cc_n, cc_inl, ratio_n, ratio_inl]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()
    pairs = render_pairs(args.pairs, seed=args.seed)

    configs = [
        ("uniform/8 (default)", ours_feats, ("uniform", 8)),
        ("uniform/8 learned", lambda im, o, c: ours_feats(
            im, o, c, "learned"), ("uniform", 8)),
        ("response/8", ours_feats, ("response", 8)),
        ("response/8 learned", lambda im, o, c: ours_feats(
            im, o, c, "learned"), ("response", 8)),
        ("response/4", ours_feats, ("response", 4)),
        ("response/4 learned", lambda im, o, c: ours_feats(
            im, o, c, "learned"), ("response", 4)),
        ("cv2 ORB", cv_feats, (None, None)),
    ]
    print(f"{'config':<20} {'nkp':>5} {'repeat':>7} {'cells':>6} "
          f"{'cc50':>5} {'epi':>5} {'ratio':>6} {'epi':>5}")
    for name, fe, (order, cap) in configs:
        reps, cells, nkps, st_acc = [], [], [], []
        for im1, z1, im2, T1, T2 in pairs:
            uv1, d1 = fe(im1, order, cap)
            uv2, d2 = fe(im2, order, cap)
            nkps.append(len(uv1))
            uv2_gt, ok = gt_reproject(uv1, z1, T1, T2)
            h, w = im1.shape
            inb = (ok & (uv2_gt[:, 0] >= 0) & (uv2_gt[:, 0] < w)
                   & (uv2_gt[:, 1] >= 0) & (uv2_gt[:, 1] < h))
            if inb.sum() and len(uv2):
                d = np.linalg.norm(
                    uv2_gt[inb][:, None, :] - uv2[None, :, :], axis=-1)
                reps.append(float((d.min(1) <= 1.5).mean()))
            cells.append(len({(int(x) // 32, int(y) // 32)
                              for x, y in uv2}))
            st_acc.append(match_stages(uv1, d1, uv2, d2, T1, T2))
        st = np.array(st_acc).mean(0)
        print(f"{name:<20} {np.mean(nkps):5.0f} {np.mean(reps):7.1%} "
              f"{np.mean(cells):6.0f} {st[0]:5.0f} {st[1]:5.0f} "
              f"{st[2]:6.0f} {st[3]:5.0f}", flush=True)


if __name__ == "__main__":
    main()
