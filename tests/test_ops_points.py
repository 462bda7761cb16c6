import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.ops import fast, select, orb, hamming, extract, pyramid


def checkerboard_corners(h=120, w=160, step=24):
    """Synthetic image with isolated bright dots — unambiguous corners."""
    img = np.full((h, w), 50.0, np.float32)
    pts = []
    for y in range(step, h - step, step):
        for x in range(step, w - step, step):
            img[y, x] = 250.0
            pts.append((x, y))
    return img, pts


class TestFast:
    def test_detects_isolated_dots(self):
        img, pts = checkerboard_corners()
        score = fast.fast_score_map(jnp.asarray(img), 20.0)
        s = np.asarray(score)
        for x, y in pts:
            assert s[y, x] > 0, f"missed corner at {(x, y)}"
        # flat regions: no response
        assert s[5:15, 5:15].max() == 0

    def test_dual_threshold_prefers_high(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[30, 30] = 250.0   # strong corner
        img[40, 40] = 112.0   # weak corner (passes t=7, fails t=20)
        s = np.asarray(fast.fast_dual_threshold(jnp.asarray(img), 20.0, 7.0, margin=8))
        assert s[30, 30] > 1e5          # got the high-threshold bonus
        assert 0 < s[40, 40] < 1e5      # low-threshold only

    def test_nms_keeps_single_peak(self):
        img, _ = checkerboard_corners()
        score = fast.nms3(fast.fast_score_map(jnp.asarray(img), 20.0))
        s = np.asarray(score)
        # each dot contributes exactly one NMS survivor in its 5x5 vicinity
        ys, xs = np.nonzero(s)
        assert len(ys) > 0
        for y, x in zip(ys, xs):
            patch = s[max(0, y - 1):y + 2, max(0, x - 1):x + 2]
            assert (patch >= s[y, x]).sum() == 1 or s[y, x] == patch.max()


class TestSelect:
    def test_spatial_uniformity(self):
        # two clusters: a dense strong cluster and a sparse weak one —
        # per-cell ranking must still pick the weak cluster's corners.
        score = np.zeros((128, 128), np.float32)
        for i in range(10):
            score[10 + i, 10 + i * 2] = 1000.0 - i  # strong cluster, one cell
        score[100, 100] = 5.0
        score[70, 30] = 3.0
        uv, resp, valid = select.select_grid_topk(jnp.asarray(score), 8, cell=32, k_per_cell=4)
        got = {tuple(p) for p, v in zip(np.asarray(uv).astype(int), np.asarray(valid)) if v}
        assert (100, 100) in got
        assert (30, 70) in got

    def test_budget_and_validity(self):
        score = np.zeros((64, 64), np.float32)
        score[20, 20] = 1.0
        uv, resp, valid = select.select_grid_topk(jnp.asarray(score), 16, cell=16)
        assert np.asarray(valid).sum() == 1
        assert np.asarray(resp)[np.asarray(valid)].sum() == 1.0


class TestOrb:
    def test_ic_angle_gradient(self):
        # horizontal intensity ramp -> centroid to the right -> angle ~ 0
        img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        ang = orb.ic_angle(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.05
        # vertical ramp -> angle ~ pi/2
        ang2 = orb.ic_angle(jnp.asarray(img.T), jnp.asarray([[32.0, 32.0]]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.05

    def test_descriptor_rotation_invariance(self):
        # descriptor of a patch should be similar after in-plane rotation
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (96, 96)).astype(np.float32)
        base = np.asarray(pyramid.blur(jnp.asarray(base), 7, 2.0))
        cv2 = pytest.importorskip("cv2")
        angle_deg = 30.0
        M = cv2.getRotationMatrix2D((48, 48), angle_deg, 1.0)
        rot = cv2.warpAffine(base, M, (96, 96))
        uv = jnp.asarray([[48.0, 48.0]])
        a1 = orb.ic_angle(jnp.asarray(base), uv)
        a2 = orb.ic_angle(jnp.asarray(rot), uv)
        d1 = orb.steered_descriptor(jnp.asarray(base), uv, a1)
        d2 = orb.steered_descriptor(jnp.asarray(rot), uv, a2)
        dist = int(np.sum(np.asarray(d1) != np.asarray(d2)))
        assert dist < 80, f"rotated descriptor distance {dist}"

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, (10, 256)).astype(np.uint8)
        packed = orb.pack_bits(jnp.asarray(bits))
        assert packed.shape == (10, 32)
        un = np.asarray(orb.unpack_bits(packed))
        np.testing.assert_array_equal(un, bits)


class TestHamming:
    def test_distance_matrix_matches_numpy(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 2, (16, 256)).astype(np.uint8)
        b = rng.integers(0, 2, (24, 256)).astype(np.uint8)
        d = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        expected = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, expected)

    def test_self_distance_zero(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 2, (8, 256)).astype(np.uint8)
        d = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(a)))
        assert np.all(np.diag(d) == 0)

    def test_mutual_best(self):
        a = np.zeros((3, 256), np.uint8)
        a[1, :50] = 1
        a[2, :150] = 1
        b = a[[2, 0, 1]]  # permuted
        d = hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b))
        idx, best, second, mutual = hamming.mutual_best(d, jnp.ones(d.shape, bool))
        np.testing.assert_array_equal(np.asarray(idx), [1, 2, 0])
        assert np.all(np.asarray(mutual))
        assert np.all(np.asarray(best) == 0)

    def test_rotation_histogram(self):
        # 12 consistent matches + 1 outlier: outlier bin is 1/12 < 10% of the
        # max bin -> dropped (reference keeps 2nd/3rd bins only if >=0.1*max,
        # src/ORBmatcher.cc:1750-1760).
        dangle = np.full(13, 0.01, np.float32)
        dangle[7] = 2.0
        keep = np.asarray(hamming.rotation_histogram_mask(
            jnp.asarray(dangle), jnp.ones(13, bool)))
        assert keep[[i for i in range(13) if i != 7]].all()
        assert not keep[7]


class TestExtractEndToEnd:
    def test_extract_on_synthetic(self):
        rng = np.random.default_rng(4)
        img = rng.uniform(40, 60, (240, 320)).astype(np.float32)
        # plant strong corners
        for y in range(40, 200, 40):
            for x in range(40, 280, 40):
                img[y:y + 3, x:x + 3] = 250.0
        cfg = extract.ExtractorConfig(n_features=256, n_levels=4)
        feats = extract.extract_points(jnp.asarray(img), cfg)
        assert feats.uv.shape == (256, 2)
        assert feats.desc.shape == (256, 256)
        n_valid = int(np.asarray(feats.valid).sum())
        assert n_valid > 20, f"only {n_valid} features"
        # descriptors of valid features should not be all-identical
        d = np.asarray(feats.desc)[np.asarray(feats.valid)]
        assert np.unique(d, axis=0).shape[0] > n_valid // 2

    def test_matching_across_shift(self):
        """Features extracted from a shifted copy must match back."""
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
        img = np.asarray(pyramid.blur(jnp.asarray(img), 7, 3.0))
        shift = 4
        img2 = np.roll(img, shift, axis=1)
        cfg = extract.ExtractorConfig(n_features=128, n_levels=2)
        f1 = extract.extract_points(jnp.asarray(img), cfg)
        f2 = extract.extract_points(jnp.asarray(img2), cfg)
        idx, ok, best = hamming.hamming_nn_match(f1.desc, f2.desc, max_dist=60)
        v1 = np.asarray(f1.valid)
        okn = np.asarray(ok) & v1
        uv1 = np.asarray(f1.uv)[okn]
        uv2 = np.asarray(f2.uv)[np.asarray(idx)[okn]]
        # matched pairs should be displaced by ~(shift, 0)
        d = uv2 - uv1
        good = (np.abs(d[:, 0] - shift) < 2) & (np.abs(d[:, 1]) < 2)
        assert good.mean() > 0.5, f"only {good.mean():.2f} of matches consistent"
        assert good.sum() > 20
