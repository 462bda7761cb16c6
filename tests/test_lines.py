"""Line detector + descriptor contract tests (vs known synthetic segments
and OpenCV reference behavior where applicable)."""
import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.ops import lines as lops
from plslam_tpu.ops import hamming


def draw_segment(img, a, b, val=220.0, width=1):
    n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1)) + 1
    for t in np.linspace(0, 1, n):
        x = a[0] + t * (b[0] - a[0])
        y = a[1] + t * (b[1] - a[1])
        xi, yi = int(round(x)), int(round(y))
        if 1 <= xi < img.shape[1] - 1 and 1 <= yi < img.shape[0] - 1:
            img[yi, xi - width:xi + width + 1] = val
            img[yi - width:yi + width + 1, xi] = val
    return img


def seg_dist(pa, pb, qa, qb):
    """max endpoint-to-segment distance between detected and true segment
    (order-insensitive)."""
    def pt_line(p, a, b):
        d = b - a
        L = np.linalg.norm(d) + 1e-9
        return abs(np.cross(d / L, p - a))
    d1 = max(pt_line(pa, qa, qb), pt_line(pb, qa, qb))
    return d1


class TestDetector:
    def _scene(self, segs, h=240, w=320, bg=40.0):
        img = np.full((h, w), bg, np.float32)
        rng = np.random.default_rng(0)
        img += rng.uniform(-2, 2, (h, w)).astype(np.float32)
        for a, b in segs:
            draw_segment(img, np.asarray(a, float), np.asarray(b, float))
        return img

    def test_detects_known_segments(self):
        segs = [((40, 40), (250, 60)), ((60, 200), (280, 180)),
                ((160, 30), (150, 210)), ((30, 120), (300, 120))]
        img = self._scene(segs)
        lf = lops.detect_lines(jnp.asarray(img), n_out=64)
        ua = np.asarray(lf.uv_a)[np.asarray(lf.valid)]
        ub = np.asarray(lf.uv_b)[np.asarray(lf.valid)]
        assert len(ua) >= len(segs), f"found {len(ua)} segments"
        found = 0
        for a, b in segs:
            a, b = np.asarray(a, float), np.asarray(b, float)
            best = min(seg_dist(pa, pb, a, b) for pa, pb in zip(ua, ub))
            if best < 4.0:
                found += 1
        assert found >= len(segs) - 1, f"only matched {found}/{len(segs)} segments"

    def test_length_and_response(self):
        img = self._scene([((50, 120), (270, 120))])
        lf = lops.detect_lines(jnp.asarray(img), n_out=16)
        v = np.asarray(lf.valid)
        assert v.any()
        i = np.argmax(np.asarray(lf.length) * v)
        assert 180 < float(lf.length[i]) < 260
        np.testing.assert_allclose(float(lf.response[i]),
                                   float(lf.length[i]) / 320.0, rtol=1e-5)
        assert abs(float(lf.angle[i])) < 0.1 or abs(float(lf.angle[i]) - np.pi) < 0.1

    def test_min_length_filter(self):
        img = self._scene([((100, 100), (112, 100))])  # 12px < min 24
        lf = lops.detect_lines(jnp.asarray(img), n_out=16)
        assert not bool(np.asarray(lf.valid).any())

    def test_no_lines_on_flat(self):
        img = np.full((240, 320), 100.0, np.float32)
        lf = lops.detect_lines(jnp.asarray(img), n_out=16)
        assert not bool(np.asarray(lf.valid).any())


class TestLBD:
    def test_descriptor_repeatable_across_shift(self):
        rng = np.random.default_rng(1)
        base = rng.uniform(90, 160, (240, 320)).astype(np.float32)
        img1 = base.copy()
        draw_segment(img1, np.array([60.0, 100.0]), np.array([260.0, 140.0]), 255)
        img2 = np.roll(img1, (3, 5), (0, 1))
        lf1 = lops.detect_lines(jnp.asarray(img1), n_out=32, mag_th=8.0)
        lf2 = lops.detect_lines(jnp.asarray(img2), n_out=32, mag_th=8.0)
        v1, v2 = np.asarray(lf1.valid), np.asarray(lf2.valid)
        assert v1.any() and v2.any()
        D = np.asarray(hamming.distance_matrix(lf1.desc, lf2.desc))
        # the longest line in img1 should match its shifted twin much closer
        # than chance (128)
        i = int(np.argmax(np.asarray(lf1.length) * v1))
        j = int(D[i][v2].argmin())
        jj = np.nonzero(v2)[0][j]
        assert D[i, jj] < 80, f"best match dist {D[i, jj]}"
        # and geometry agrees with the shift: the matched midpoint must lie
        # on the shifted infinite line (endpoint extent is block-quantized,
        # so only the perpendicular component is stable)
        l1 = np.asarray(lf1.l2d[i])
        mid2 = (np.asarray(lf2.uv_a[jj]) + np.asarray(lf2.uv_b[jj])) / 2
        shifted = mid2 - [5, 3]
        perp = abs(l1[0] * shifted[0] + l1[1] * shifted[1] + l1[2])
        assert perp < 4.0, f"perpendicular offset {perp:.2f}px"  # detector precision ~3px (block fit)

    def test_descriptor_distinguishes_different_lines(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(90, 160, (240, 320)).astype(np.float32)
        for k in range(6):
            draw_segment(img, np.array([30.0 + 40 * k, 30.0]),
                         np.array([40.0 + 40 * k, 210.0]), 255)
        lf = lops.detect_lines(jnp.asarray(img), n_out=32, mag_th=8.0)
        v = np.asarray(lf.valid)
        assert v.sum() >= 3
        d = np.asarray(lf.desc)[v]
        D = np.asarray(hamming.distance_matrix(jnp.asarray(d), jnp.asarray(d)))
        off = D[~np.eye(len(d), dtype=bool)]
        assert off.mean() > 40, f"descriptors too similar: mean {off.mean()}"
