"""Stereo keypoint depth: rectified left-right matching on the MXU.

TPU-native counterpart of `Frame::ComputeStereoMatches`
(`src/Frame.cc:977`): the reference walks per-row candidate lists with a
descriptor search then SAD subpixel refinement; here the row constraint is a
mask on the full left x right Hamming matrix, followed by a batched SAD
parabola refinement on gathered patches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import hamming

TH_HIGH = 100


def stereo_match(feats_l, feats_r, img_l, img_r, fx: float, baseline: float,
                 scale_factors, row_tol: float = 2.0, max_disp: float = 128.0,
                 sad_half: int = 5, refine_range: int = 5):
    """Returns (depth (N,), u_right (N,), ok (N,)) for left keypoints.

    Gates follow the reference: same-row within ~2px x octave scale,
    disparity in (0, max_disp], Hamming <= TH_HIGH, then SAD subpixel
    refinement of u_r on a +-refine_range window with parabola fit
    (`src/Frame.cc:1050-1130` semantics).
    """
    D = hamming.distance_matrix(feats_l.desc, feats_r.desc)
    dv = jnp.abs(feats_l.uv[:, 1:2] - feats_r.uv[None, :, 1])
    tol = row_tol * scale_factors[feats_l.octave][:, None]
    disp = feats_l.uv[:, 0:1] - feats_r.uv[None, :, 0]
    mask = (dv <= tol) & (disp > 0.1) & (disp <= max_disp)
    mask = mask & feats_l.valid[:, None] & feats_r.valid[None, :]
    idx, best, _ = hamming.masked_best2(D, mask)
    ok = best <= TH_HIGH

    # --- SAD subpixel refinement around the matched right column ---
    # Patch gathers land on the integer pixel grid, so BOTH coordinates
    # must be rounded to that grid and the refined column expressed
    # relative to it: mixing the keypoints' fractional coordinates with
    # integer-grid patches biased disparity by up to 1px (z^2/(fx b)
    # amplified — the round-2 far-field p90 ~5% depth-error tail).
    ul_i = jnp.round(feats_l.uv[:, 0])
    uv_l_g = jnp.stack([ul_i, jnp.round(feats_l.uv[:, 1])], -1)
    patch_l = _gather_patches(img_l, uv_l_g, sad_half)              # (N,w,w)
    ur_i = jnp.round(feats_r.uv[idx, 0])
    v_r = jnp.round(feats_r.uv[idx, 1])

    def sad_at(offset):
        uv_r = jnp.stack([ur_i + offset, v_r], -1)
        p = _gather_patches(img_r, uv_r, sad_half)
        return jnp.mean(jnp.abs(p - patch_l), axis=(-1, -2))        # (N,)

    offs = jnp.arange(-refine_range, refine_range + 1, dtype=jnp.float32)
    sads = jnp.stack([sad_at(o) for o in offs], -1)                  # (N, 2r+1)
    b = jnp.argmin(sads, axis=-1)
    bc = jnp.clip(b, 1, sads.shape[-1] - 2)
    s_m = jnp.take_along_axis(sads, (bc - 1)[:, None], -1)[:, 0]
    s_0 = jnp.take_along_axis(sads, bc[:, None], -1)[:, 0]
    s_p = jnp.take_along_axis(sads, (bc + 1)[:, None], -1)[:, 0]
    denom = jnp.maximum(s_m - 2 * s_0 + s_p, 1e-6)
    frac = jnp.clip(0.5 * (s_m - s_p) / denom, -1.0, 1.0)
    u_r = ur_i + offs[bc] + frac

    # second pass at half-pixel step with horizontally-bilinear right
    # patches: the integer-grid parabola leaves ~0.2px of disparity noise,
    # which z^2/(fx b) amplifies into the far-field depth-error tail
    def sad_at_f(u):                                                # (N,)
        f = jnp.floor(u)
        wfrac = (u - f)[:, None, None]
        p0 = _gather_patches(img_r, jnp.stack([f, v_r], -1), sad_half)
        p1 = _gather_patches(img_r, jnp.stack([f + 1.0, v_r], -1), sad_half)
        p = (1.0 - wfrac) * p0 + wfrac * p1
        return jnp.mean(jnp.abs(p - patch_l), axis=(-1, -2))

    h = 0.5
    s2m, s20, s2p = sad_at_f(u_r - h), sad_at_f(u_r), sad_at_f(u_r + h)
    den2 = jnp.maximum(s2m - 2 * s20 + s2p, 1e-6)
    frac2 = jnp.clip(h * 0.5 * (s2m - s2p) / den2, -h, h)
    u_r = u_r + frac2

    disparity = ul_i - u_r
    ok = ok & (disparity > 0.1) & (disparity <= max_disp)
    # fine-octave keypoints only: disparity noise scales with the octave's
    # localization error, and depth error amplifies it by z^2/(fx b)
    ok = ok & (feats_l.octave <= 1)
    depth = fx * baseline / jnp.maximum(disparity, 1e-6)
    return depth, u_r, ok


def _gather_patches(img, uv, r):
    h, w = img.shape
    size = 2 * r + 1
    x0 = jnp.clip(uv[:, 0].astype(jnp.int32) - r, 0, w - size)
    y0 = jnp.clip(uv[:, 1].astype(jnp.int32) - r, 0, h - size)
    return jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y, x), (size, size)))(y0, x0)


def depth_at(depth_img, uv):
    """Nearest-pixel depth lookup for keypoints (`Frame::ComputeStereoFromRGBD`,
    `src/Frame.cc:1154`)."""
    h, w = depth_img.shape
    u = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth_img[v, u]
