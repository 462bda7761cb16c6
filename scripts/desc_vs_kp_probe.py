"""Decompose the match-density gap: keypoints vs descriptors vs rotation
binning (ROADMAP accuracy lever #2, follow-up to match_density_probe.py).

Four conditions over the same frame pairs, identical gate stack
(cross-check + Hamming<=50, then ratio<0.75), epipolar inliers (<2 px under
GT geometry) as the quality metric:

  ours            — our keypoints + our binned-rotation descriptors;
  ours+exactrot   — our keypoints + our pattern sampled at the EXACT
                    continuous rotation (numpy; isolates the 12-deg bin
                    quantization of ops/orb.py);
  ours+cv2desc    — our keypoints (pt/angle/octave handed to cv2) + cv2's
                    learned-pattern ORB descriptors (isolates pattern
                    quality + blur differences);
  cv2             — cv2 ORB detectAndCompute (the 687-matches/pair bar).

Usage: SEQ_DIR=/tmp/refseq2 python scripts/desc_vs_kp_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
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


def extract_ours(img):
    """Run our extractor; return level-0 uv, bit desc, plus the raw
    per-level data needed to recompute descriptors differently."""
    from plslam_tpu.ops import extract, pyramid, fast, select, orb
    cfg = extract.ExtractorConfig(n_features=1024)
    levels = pyramid.build_pyramid(jnp.asarray(img, jnp.float32),
                                   cfg.n_levels, cfg.scale)
    budgets = extract.level_budgets(cfg)
    out = []
    for l, (im_l, n_l) in enumerate(zip(levels, budgets)):
        if n_l == 0:
            continue
        score = fast.fast_dual_threshold(im_l, cfg.th_fast_high,
                                         cfg.th_fast_low, cfg.margin)
        uv, resp, valid = select.select_grid_topk(score, n_l, cell=cfg.cell)
        ang = orb.ic_angle(im_l, uv)
        im_blur = pyramid.blur(im_l)
        bits = orb.steered_descriptor(im_blur, uv, ang)
        h_l, w_l = im_l.shape
        h0, w0 = levels[0].shape
        sxy = np.array([w0 / w_l, h0 / h_l], np.float32)
        out.append(dict(level=l, uv=np.asarray(uv), ang=np.asarray(ang),
                        bits=np.asarray(bits), valid=np.asarray(valid),
                        blur=np.asarray(im_blur), sxy=sxy))
    return out


def exact_rot_desc(blur, uv, ang):
    """Continuous-rotation nearest-sample descriptor with OUR pattern."""
    from plslam_tpu.ops.orb import PATTERN, HALF_PATCH
    h, w = blur.shape
    c, s = np.cos(ang), np.sin(ang)              # (K,)
    pat = PATTERN.astype(np.float64)             # (256, 4)

    def sample(which):
        px, py = pat[:, which], pat[:, which + 1]
        rx = np.clip(np.round(px[None] * c[:, None] - py[None] * s[:, None]),
                     -HALF_PATCH, HALF_PATCH)
        ry = np.clip(np.round(px[None] * s[:, None] + py[None] * c[:, None]),
                     -HALF_PATCH, HALF_PATCH)
        x = np.clip(np.round(uv[:, 0:1] + rx).astype(int), 0, w - 1)
        y = np.clip(np.round(uv[:, 1:2] + ry).astype(int), 0, h - 1)
        return blur[y, x]

    ia, ib = sample(0), sample(2)
    return (ib > ia).astype(np.uint8)


def feats_variant(img, variant):
    import cv2
    if variant == "cv2":
        orb_d = cv2.ORB_create(nfeatures=1024, scaleFactor=1.2, nlevels=8,
                               fastThreshold=20)
        kps, desc = orb_d.detectAndCompute(img, None)
        if not kps or desc is None:
            return np.zeros((0, 2)), ("packed", np.zeros((0, 32), np.uint8))
        return np.array([k.pt for k in kps]), ("packed", desc)
    data = extract_ours(img)
    uvs, descs = [], []
    if variant == "ours+cv2desc":
        kps = []
        for d in data:
            v = d["valid"]
            uv0 = d["uv"][v] * d["sxy"][None]
            for i in range(v.sum()):
                kp = cv2.KeyPoint(float(uv0[i, 0]), float(uv0[i, 1]),
                                  31.0 * 1.2 ** d["level"],
                                  float(np.degrees(d["ang"][v][i]) % 360.0),
                                  0.0, int(d["level"]))
                kps.append(kp)
        orb_d = cv2.ORB_create(nfeatures=2048, scaleFactor=1.2, nlevels=8)
        kps2, desc = orb_d.compute(img, kps)
        if not kps2 or desc is None:
            return np.zeros((0, 2)), ("packed", np.zeros((0, 32), np.uint8))
        return np.array([k.pt for k in kps2]), ("packed", desc)
    for d in data:
        v = d["valid"]
        uv0 = d["uv"][v] * d["sxy"][None]
        if variant == "ours+exactrot":
            bits = exact_rot_desc(d["blur"], d["uv"][v], d["ang"][v])
        else:
            bits = d["bits"][v]
        uvs.append(uv0)
        descs.append(bits)
    if not uvs or sum(len(u) for u in uvs) == 0:
        return np.zeros((0, 2)), ("bits", np.zeros((0, 256), np.uint8))
    return np.concatenate(uvs), ("bits", np.concatenate(descs))


def ham(d2, d1):
    kind, a2 = d2
    _, a1 = d1
    if kind == "bits":
        return (a2[:, None, :] != a1[None, :, :]).sum(-1).astype(np.int32)
    bits = np.unpackbits(a2[:, None, :] ^ a1[None, :, :], axis=-1)
    return bits.sum(-1).astype(np.int32)


def stages(uv1, uv2_all, D, T1, T2):
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
    variants = ["ours", "ours+exactrot", "ours+cv2desc", "cv2"]
    acc = {}
    nfeat = {v: [] for v in variants}
    for i, jdx in PAIRS:
        im1 = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
        im2 = cv2.imread(paths[jdx], cv2.IMREAD_GRAYSCALE)
        for v in variants:
            uv1, d1 = feats_variant(im1, v)
            uv2, d2 = feats_variant(im2, v)
            nfeat[v] += [len(uv1), len(uv2)]
            if len(uv1) == 0 or len(uv2) == 0:   # blank/unreadable frame
                for kname in ("crosscheck50", "ratio"):
                    acc.setdefault((v, kname), []).append((0, 0))
                continue
            st = stages(uv1, uv2, ham(d2, d1), gt[i], gt[jdx])
            for kname, val in st.items():
                acc.setdefault((v, kname), []).append(val)
    for v in variants:
        line = f"{v:14} feats={np.mean(nfeat[v]):6.0f}"
        for kname in ("crosscheck50", "ratio"):
            ns = np.array(acc[(v, kname)])
            line += (f"  {kname}: n={ns[:, 0].mean():5.0f} "
                     f"epi_inl={ns[:, 1].mean():5.0f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
