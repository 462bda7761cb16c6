"""Data-parallel line-segment detection + binary line descriptors.

TPU-native replacement for the LSD detector + LBD descriptor stack
(`Thirdparty/line_descriptor`, wrapped by `LINEextractor`,
`src/LineExtractor.cpp:26-93`).  LSD's sequential region-growing cannot map
to the hardware; this detector keeps LSD's OUTPUT CONTRACT (<= n_out
oriented segments with endpoints, angle, length-based response, min-length
filter, 32-byte binary descriptor) with a fully parallel formulation:

1. Sobel gradients -> per-8x8-block structure tensors (one reduction);
2. blocks with high coherence are 'line blocks' carrying a principal
   direction;
3. each line block links to the collinear neighbor block along +-direction;
   chains form by pointer doubling (log2 steps of jnp gathers — the
   region-growing equivalent, but O(log n) parallel);
4. per-chain least-squares line fit from scattered pixel-level gradient
   moments; endpoints from extremal projections; top-k by length.

The LBD equivalent samples a 9-band x S-sample support rectangle of
rotated gradients (`binary_descriptor_custom.cpp:113-173` semantics) and
binarizes band statistics with a fixed seeded comparison pattern into 256
bits, so line matching shares the int8-matmul Hamming machinery of points.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import orb


class LineFeatures(NamedTuple):
    """Fixed-capacity per-frame line features (KeyLine equivalent)."""

    uv_a: jnp.ndarray      # (M, 2) endpoint A (pixels)
    uv_b: jnp.ndarray      # (M, 2) endpoint B
    l2d: jnp.ndarray       # (M, 3) infinite line, (l0,l1) unit normal
    angle: jnp.ndarray     # (M,) direction angle in [0, pi)
    length: jnp.ndarray    # (M,)
    response: jnp.ndarray  # (M,) length / max(W, H) like LSDDetector_custom.cpp:194
    desc: jnp.ndarray      # (M, 256) uint8 bits
    valid: jnp.ndarray     # (M,) bool


def sobel(img):
    """(H,W) -> gx, gy with replicate border (shifted-slice sums — tiny-
    kernel convs lower poorly on TPU)."""
    h, w = img.shape
    x = jnp.pad(img, 1, mode="edge")

    def sh(dy, dx):
        return x[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    gx = ((sh(-1, 1) - sh(-1, -1)) + 2.0 * (sh(0, 1) - sh(0, -1))
          + (sh(1, 1) - sh(1, -1))) / 8.0
    gy = ((sh(1, -1) - sh(-1, -1)) + 2.0 * (sh(1, 0) - sh(-1, 0))
          + (sh(1, 1) - sh(-1, 1))) / 8.0
    return gx, gy


def _angle_diff(a, b):
    """Absolute difference of undirected angles (mod pi)."""
    d = jnp.abs(a - b) % jnp.pi
    return jnp.minimum(d, jnp.pi - d)


def detect_lines(img, n_out: int = 256, block: int = 8,
                 coherence_th: float = 0.7, mag_th: float = 3.0,
                 angle_tol: float = 0.30, min_length: float = 24.0,
                 perp_tol: float = 2.5, mask=None):
    """img: (H, W) float32 -> LineFeatures with n_out static slots.

    `mask`: optional (H, W) {0,1} suppression mask — blocks whose masked
    fraction is below 0.8 are excluded, mirroring the reference's LSD mask
    feature (`masks/`, `src/LSDDetector_custom.cpp:202-213`)."""
    H, W = img.shape
    gx, gy = sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    if mask is not None:
        mag = mag * mask

    gb = H // block, W // block
    nb = gb[0] * gb[1]

    def block_sum(a):
        return a[:gb[0] * block, :gb[1] * block].reshape(
            gb[0], block, gb[1], block).sum(axis=(1, 3))

    # structure tensor per block (gradient-energy weighted)
    Jxx = block_sum(gx * gx)
    Jxy = block_sum(gx * gy)
    Jyy = block_sum(gy * gy)
    tr = Jxx + Jyy
    det = Jxx * Jyy - Jxy * Jxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    l1 = 0.5 * (tr + disc)
    l2 = 0.5 * (tr - disc)
    coherence = (l1 - l2) / jnp.maximum(l1 + l2, 1e-6)
    mean_mag = block_sum(mag) / (block * block)
    # gradient direction is NORMAL to the edge; the line direction is its
    # perpendicular. The structure-tensor principal axis follows the
    # gradient; rotate by 90 deg.
    grad_angle = 0.5 * jnp.arctan2(2.0 * Jxy, Jxx - Jyy)  # [-pi/2, pi/2]
    line_angle = (grad_angle + jnp.pi / 2.0) % jnp.pi      # [0, pi)

    is_line = (coherence > coherence_th) & (mean_mag > mag_th)
    if mask is not None:
        mask_frac = block_sum(mask) / (block * block)
        is_line = is_line & (mask_frac > 0.8)

    # block centers
    by = (jnp.arange(gb[0]) * block + block // 2).astype(jnp.float32)
    bx = (jnp.arange(gb[1]) * block + block // 2).astype(jnp.float32)
    cy = jnp.broadcast_to(by[:, None], gb)
    cx = jnp.broadcast_to(bx[None, :], gb)

    flat = lambda a: a.reshape(-1)
    is_line_f = flat(is_line)
    ang_f = flat(line_angle)
    cx_f = flat(cx)
    cy_f = flat(cy)

    # --- link to the successor block along +direction ---
    # Canonicalize the undirected block direction so adjacent blocks agree
    # on the sign (mod-pi estimates straddle 0/pi for near-horizontal
    # lines, which would break chain links): force dx > 0, tie-breaking
    # near-vertical lines with dy > 0.
    dx = jnp.cos(ang_f)
    dy = jnp.sin(ang_f)
    flip = (dx < 0) | ((jnp.abs(dx) < 1e-3) & (dy < 0))
    dx = jnp.where(flip, -dx, dx)
    dy = jnp.where(flip, -dy, dy)
    gyi = jnp.arange(nb) // gb[1]
    gxi = jnp.arange(nb) % gb[1]

    def neighbor_id(sign):
        nx = gxi + jnp.round(sign * dx).astype(jnp.int32)
        ny = gyi + jnp.round(sign * dy).astype(jnp.int32)
        ok = (nx >= 0) & (nx < gb[1]) & (ny >= 0) & (ny < gb[0])
        nid = jnp.clip(ny, 0, gb[0] - 1) * gb[1] + jnp.clip(nx, 0, gb[1] - 1)
        return nid, ok

    def link(sign):
        nid, ok = neighbor_id(sign)
        same_dir = _angle_diff(ang_f, ang_f[nid]) < angle_tol
        # collinearity: neighbor center close to this block's line
        nxp = -dy  # line normal
        nyp = dx
        off = (cx_f[nid] - cx_f) * nxp + (cy_f[nid] - cy_f) * nyp
        collinear = jnp.abs(off) < perp_tol
        good = ok & is_line_f & is_line_f[nid] & same_dir & collinear
        return jnp.where(good, nid, jnp.arange(nb))

    nxt = link(+1.0)
    prv = link(-1.0)
    # require mutual consistency (nxt of prev is self) to avoid Y-joins
    prv_ok = nxt[prv] == jnp.arange(nb)
    prv = jnp.where(prv_ok, prv, jnp.arange(nb))

    # --- chain roots by pointer doubling on prv ---
    # chains are bounded by the block-grid diagonal, not nb: doubling depth
    # log2(diag) suffices (each extra step is a serial (nb,) gather)
    root = prv
    diag = float(np.hypot(gb[0], gb[1]))
    steps = int(np.ceil(np.log2(max(diag, 2.0)))) + 1
    for _ in range(steps):
        root = root[root]
    root = jnp.where(is_line_f, root, nb)  # non-line blocks -> dump slot

    # --- per-chain pixel-level moments (scatter by root id) ---
    # per-block gradient-weighted centroid moments at pixel precision.
    # Orientation gating: only pixels whose own gradient direction agrees
    # with the block's principal gradient direction contribute — corner
    # pixels and off-edge texture otherwise bias the least-squares fit by
    # 1-2 px (the detector's main localization error; cf LSD's level-line
    # field alignment test, `LSDDetector_custom.cpp` region growing).
    ys, xs = jnp.meshgrid(jnp.arange(gb[0] * block, dtype=jnp.float32),
                          jnp.arange(gb[1] * block, dtype=jnp.float32),
                          indexing="ij")
    px_grad_angle = jnp.arctan2(gy, gx)[:gb[0] * block, :gb[1] * block]
    blk_grad_angle = jnp.repeat(jnp.repeat(grad_angle, block, axis=0),
                                block, axis=1)
    # both mod pi (undirected); soft cosine-squared gate keeps gradients
    # differentiable-smooth and zero at 45 deg misalignment
    d_ga = (px_grad_angle % jnp.pi) - (blk_grad_angle % jnp.pi)
    align = jnp.cos(d_ga) ** 2  # period pi: 1 aligned, 0 perpendicular
    w = mag[:gb[0] * block, :gb[1] * block] * jnp.where(align > 0.75,
                                                        align, 0.0)
    bs = lambda a: flat(block_sum(a))
    m00 = bs(w)
    m10 = bs(w * xs)
    m01 = bs(w * ys)
    m20 = bs(w * xs * xs)
    m11 = bs(w * xs * ys)
    m02 = bs(w * ys * ys)

    def chain_sum(vals):
        return jnp.zeros((nb + 1,), vals.dtype).at[root].add(
            jnp.where(is_line_f, vals, 0.0))[:nb]

    C00 = chain_sum(m00)
    C10 = chain_sum(m10)
    C01 = chain_sum(m01)
    C20 = chain_sum(m20)
    C11 = chain_sum(m11)
    C02 = chain_sum(m02)
    n_blocks_in = jnp.zeros((nb + 1,), jnp.int32).at[root].add(
        is_line_f.astype(jnp.int32))[:nb]

    # least-squares line: principal axis of the pixel covariance
    mx = C10 / jnp.maximum(C00, 1e-6)
    my = C01 / jnp.maximum(C00, 1e-6)
    vxx = C20 / jnp.maximum(C00, 1e-6) - mx * mx
    vxy = C11 / jnp.maximum(C00, 1e-6) - mx * my
    vyy = C02 / jnp.maximum(C00, 1e-6) - my * my
    fit_angle = (0.5 * jnp.arctan2(2.0 * vxy, vxx - vyy)) % jnp.pi
    fdx = jnp.cos(fit_angle)
    fdy = jnp.sin(fit_angle)

    # endpoints: extremal projections of member block centers (+- half block)
    rsafe = jnp.clip(root, 0, nb - 1)
    proj = (cx_f - mx[rsafe]) * fdx[rsafe] + (cy_f - my[rsafe]) * fdy[rsafe]
    big = jnp.float32(1e9)
    pmin = jnp.full((nb + 1,), big).at[root].min(
        jnp.where(is_line_f, proj, big))[:nb]
    pmax = jnp.full((nb + 1,), -big).at[root].max(
        jnp.where(is_line_f, proj, -big))[:nb]
    half = block * 0.5
    pmin = pmin - half
    pmax = pmax + half

    is_chain = (n_blocks_in > 0)
    length = jnp.where(is_chain, pmax - pmin, 0.0)
    ok_chain = is_chain & (length >= min_length)

    ax = mx + pmin * fdx
    ay = my + pmin * fdy
    bx2 = mx + pmax * fdx
    by2 = my + pmax * fdy

    # --- top-k by length ---
    score = jnp.where(ok_chain, length, -1.0)
    k = min(n_out, nb)
    vals, sel = jax.lax.top_k(score, k)
    valid = vals > 0
    uv_a = jnp.stack([ax[sel], ay[sel]], -1)
    uv_b = jnp.stack([bx2[sel], by2[sel]], -1)
    if k < n_out:
        pad = n_out - k
        uv_a = jnp.pad(uv_a, ((0, pad), (0, 0)))
        uv_b = jnp.pad(uv_b, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        sel = jnp.pad(sel, (0, pad))

    ang = jnp.arctan2(uv_b[:, 1] - uv_a[:, 1], uv_b[:, 0] - uv_a[:, 0]) % jnp.pi
    ll = jnp.maximum(vals, 0.0)

    # normalized infinite line through the endpoints
    pa = jnp.concatenate([uv_a, jnp.ones_like(uv_a[:, :1])], -1)
    pb = jnp.concatenate([uv_b, jnp.ones_like(uv_b[:, :1])], -1)
    l = jnp.cross(pa, pb)
    nrm = jnp.maximum(jnp.linalg.norm(l[:, :2], axis=-1, keepdims=True), 1e-9)
    l2d = l / nrm

    # descriptor gradients from the smoothed image (the reference computes
    # LBD on Gaussian-pyramid octaves, binary_descriptor_custom.cpp:350-430)
    from . import pyramid as _pyr
    gxs, gys = sobel(_pyr.blur(img, ksize=5, sigma=1.4))
    desc = lbd_descriptor(gxs, gys, uv_a, uv_b)
    return LineFeatures(
        uv_a=uv_a, uv_b=uv_b, l2d=l2d, angle=ang, length=ll,
        response=ll / float(max(H, W)), desc=desc, valid=valid)


# ----------------------------------------------------------------------
# LBD-style binary descriptor
# ----------------------------------------------------------------------

N_BANDS = 9
BAND_W = 7
N_SAMPLES = 24  # samples along the line


def _make_lbd_pairs(seed: int = 31415926, dim: int = N_BANDS * 8,
                    bits: int = 256) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, dim, bits)
    b = rng.integers(0, dim, bits)
    clash = a == b
    b[clash] = (b[clash] + 1 + rng.integers(0, dim - 1, clash.sum())) % dim
    return np.stack([a, b], -1).astype(np.int32)


LBD_PAIRS = _make_lbd_pairs()


def lbd_descriptor(gx, gy, uv_a, uv_b):
    """(M, 256) uint8 bits per segment.

    Band-gradient statistics in the line frame (d∥, d⊥): for each of
    N_BANDS bands across the line and N_SAMPLES along it, accumulate the
    4 one-sided gradient sums; band means+stds (8 floats/band) are
    binarized by a fixed seeded comparison pattern — the TPU analog of
    `computeLBD` + the 32-pair binarization
    (`binary_descriptor_custom.cpp:74,1026`)."""
    H, W = gx.shape
    M = uv_a.shape[0]
    d = uv_b - uv_a
    L = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    dpar = d / L                                  # (M,2) along-line unit
    dperp = jnp.stack([-dpar[:, 1], dpar[:, 0]], -1)

    # Sample a FIXED-length window centered at the segment midpoint (not the
    # full detected extent): chain-extent instability across frames would
    # otherwise misalign the band samples and wreck repeatability.
    win = jnp.minimum(L[:, 0], 64.0)                    # (M,)
    t = (jnp.arange(N_SAMPLES, dtype=jnp.float32) + 0.5) / N_SAMPLES - 0.5  # (S,) in [-.5,.5)
    bands = (jnp.arange(N_BANDS, dtype=jnp.float32) - (N_BANDS - 1) / 2.0) * BAND_W

    mid = 0.5 * (uv_a + uv_b)
    base = (mid[:, None, None, :]
            + (t[None, None, :, None] * win[:, None, None, None]) * dpar[:, None, None, :])
    pos = base + bands[None, :, None, None] * dperp[:, None, None, :]
    px = jnp.clip(pos[..., 0] + 0.5, 0, W - 2)
    py = jnp.clip(pos[..., 1] + 0.5, 0, H - 2)

    # Nearest sampling on the (already octave-smoothed) gradient fields via
    # ONE packed tile-row gather (orb.tile_sample_nearest) — bilinear element
    # gathers here were the hottest stage of line extraction on TPU (the
    # sub-pixel offset it discarded is far below the band statistics' 7px
    # granularity; the 24-sample band mean averages the residual noise).
    tg = orb.pack_tiles_pair(gx, gy)
    sg = orb.tile_sample_nearest(tg, px, py)          # (M, B, S, 2)
    sgx = sg[..., 0]
    sgy = sg[..., 1]
    g_par = sgx * dpar[:, None, None, 0] + sgy * dpar[:, None, None, 1]
    g_perp = sgx * dperp[:, None, None, 0] + sgy * dperp[:, None, None, 1]

    feats = jnp.stack([
        jnp.maximum(g_perp, 0.0), jnp.maximum(-g_perp, 0.0),
        jnp.maximum(g_par, 0.0), jnp.maximum(-g_par, 0.0),
    ], axis=-1)                                    # (M, B, S, 4)
    mean = feats.mean(axis=2)                       # (M, B, 4)
    std = feats.std(axis=2)                         # (M, B, 4)
    vec = jnp.concatenate([mean, std], -1).reshape(M, N_BANDS * 8)
    # scale-normalize like LBD (unit norm halves)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)

    pairs = jnp.asarray(LBD_PAIRS)
    bits = (vec[:, pairs[:, 0]] < vec[:, pairs[:, 1]]).astype(jnp.uint8)
    return bits
