"""Full ORB-style multi-scale point feature extraction as one XLA program.

TPU-native counterpart of `ORBextractor::operator()`
(`src/ORBextractor.cc:1043-1105`): pyramid -> dense FAST (dual threshold) ->
NMS -> grid-uniform top-k per level -> IC-angle orientation -> steered
binary descriptor, all with static shapes.  The per-level feature budget is
geometric in 1/scale exactly like the reference (`src/ORBextractor.cc:435-446`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast, orb, pyramid, select


class PointFeatures(NamedTuple):
    """Fixed-capacity per-frame point features (the `Frame` keypoint block,
    cf `src/Frame.cc:224-293`)."""

    uv: jnp.ndarray        # (N, 2) float32 — level-0 (distorted-image) coords
    uv_un: jnp.ndarray     # (N, 2) float32 — undistorted pixel coords (filled by Frame)
    response: jnp.ndarray  # (N,)  float32
    octave: jnp.ndarray    # (N,)  int32
    angle: jnp.ndarray     # (N,)  float32 radians
    desc: jnp.ndarray      # (N, 256) uint8 bits
    valid: jnp.ndarray     # (N,)  bool


class ExtractorConfig(NamedTuple):
    n_features: int = 1024
    n_levels: int = 8
    scale: float = 1.2
    th_fast_high: float = 20.0
    th_fast_low: float = 7.0
    margin: int = 20          # reference EDGE_THRESHOLD=19 (+1 for rotation)
    cell: int = 32            # ~30px FAST cells in the reference
    subpixel: bool = False    # quadratic peak refinement of keypoint
                              # locations on the pre-NMS score map
                              # (descriptors still sample the integer
                              # location, like the reference); MEASURED
                              # WORSE twice — see refine_subpixel
    level_map: int = 1        # level->base coordinate mapping:
                              # 0 = uv * scale**l (the reference's naive
                              #     mapping, src/ORBextractor.cc:1099 —
                              #     carries a measured per-octave TILT bias
                              #     because rounded level dims make the
                              #     actual ratio differ from scale**l),
                              # 1 = uv * (dim0/dim_l) per axis (tilt
                              #     removed; the constant half-pixel term
                              #     is absorbed into landmark positions),
                              # 2 = (uv + 0.5) * (dim0/dim_l) - 0.5 (the
                              #     geometrically exact map of the
                              #     half-pixel-center bilinear pyramid).
                              # See scripts/gba_gt_probe.py for the
                              # measured per-octave bias table.
    sel_order: str = "uniform"  # keypoint selection priority once the
                              # per-cell cap holds (ops/select.py): "uniform"
                              # = champion-per-cell first (quadtree goal);
                              # "response" = strongest-first (cv2 retainBest
                              # ordering; measured 2.3x keypoint
                              # repeatability on the photo head-to-head)
    desc_pattern: str = "learned"  # binary-test pattern: "gauss" (seeded
                              # Gaussian, BRIEF construction) or "learned"
                              # (rBRIEF greedy-decorrelated on our own
                              # rendered patches, scripts/learn_pattern.py;
                              # ops/learned_pattern.npy artifact)
    sel_cap: int = 8          # max keypoints drawn from one selection cell
                              # (k_per_cell in ops/select.py). With
                              # sel_order="response" a small cap is the
                              # spatial-spread backstop (the reference's
                              # quadtree keeps best-per-adaptive-node;
                              # response-order + cap approximates that
                              # with response-stable membership)


def level_budgets(cfg: ExtractorConfig):
    """Per-level feature counts, geometric in 1/scale
    (cf `src/ORBextractor.cc:435-446`)."""
    inv = 1.0 / cfg.scale
    raw = np.array([inv ** l for l in range(cfg.n_levels)])
    raw = raw / raw.sum() * cfg.n_features
    budgets = np.floor(raw).astype(int)
    budgets[0] += cfg.n_features - budgets.sum()
    return [int(b) for b in budgets]


def extract_points(img, cfg: ExtractorConfig = ExtractorConfig()) -> PointFeatures:
    """img: (H, W) float32 grayscale in [0, 255] -> PointFeatures with
    N = cfg.n_features static slots."""
    levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale)
    budgets = level_budgets(cfg)

    uv_all, resp_all, oct_all, ang_all, desc_all, valid_all = [], [], [], [], [], []
    for l, (im_l, n_l) in enumerate(zip(levels, budgets)):
        if n_l == 0:
            continue
        raw = None
        if cfg.subpixel:
            score, raw = fast.fast_dual_threshold(
                im_l, cfg.th_fast_high, cfg.th_fast_low, cfg.margin,
                return_raw=True)
        else:
            score = fast.fast_dual_threshold(im_l, cfg.th_fast_high,
                                             cfg.th_fast_low, cfg.margin)
        uv, resp, valid = select.select_grid_topk(score, n_l, cell=cfg.cell,
                                                  k_per_cell=cfg.sel_cap,
                                                  order=cfg.sel_order)
        ang = orb.ic_angle(im_l, uv)
        im_blur = pyramid.blur(im_l)
        bits = orb.steered_descriptor(im_blur, uv, ang,
                                      pattern=cfg.desc_pattern)
        if raw is not None:
            # geometry gets the refined location; orientation + descriptor
            # above sampled the integer location (reference parity)
            uv = refine_subpixel(raw, uv)

        # Level->base coordinate mapping (cfg.level_map). The naive
        # `uv * scale**l` (the reference's choice, src/ORBextractor.cc:
        # 1099) ignores that rounded level dimensions make the actual
        # resize ratio differ from scale**l — a per-octave TILT bias of
        # +-0.2..0.5 px whose sign flips with the per-axis rounding
        # direction, measured at GT poses on the photo head-to-head
        # (octave 6 mean residual (-0.45,+0.13) px, octave 7
        # (+0.45,-0.15); scripts/gba_gt_probe.py). Mode 1 scales by the
        # actual per-axis ratio, killing the tilt; mode 2 additionally
        # applies the half-pixel-center offset of the bilinear pyramid
        # (geometrically exact; the constant is normally absorbed into
        # landmark positions, so 1 vs 2 measured indistinguishable).
        h_l, w_l = im_l.shape
        h0, w0 = levels[0].shape
        if cfg.level_map == 0:
            uv0 = uv * (cfg.scale ** l)
        else:
            sxy = jnp.asarray([w0 / w_l, h0 / h_l], jnp.float32)
            uv0 = uv * sxy if cfg.level_map == 1 else (uv + 0.5) * sxy - 0.5
        uv_all.append(uv0)
        resp_all.append(resp)
        oct_all.append(jnp.full((n_l,), l, jnp.int32))
        ang_all.append(ang)
        desc_all.append(bits)
        valid_all.append(valid)

    uv = jnp.concatenate(uv_all)
    feats = PointFeatures(
        uv=uv,
        uv_un=uv,  # identity until Frame applies undistortion
        response=jnp.concatenate(resp_all),
        octave=jnp.concatenate(oct_all),
        angle=jnp.concatenate(ang_all),
        desc=jnp.concatenate(desc_all),
        valid=jnp.concatenate(valid_all),
    )
    return feats


def refine_subpixel(score, uv):
    """Quadratic sub-pixel refinement on a score map. NOT used by the
    pipeline (`ExtractorConfig.subpixel` defaults False): measured on the
    synthetic suite it WORSENS ATE (the FAST ring score's peak is biased
    off the geometric corner on block textures), and re-measured in round 3
    on the 300-frame PHOTO-texture head-to-head sequence with healthy
    triangulation conditioning it is 2.8x WORSE (keyframe ATE 0.075
    subpixel=1 vs 0.027 off; scripts/ab_ours.py). The FAST ring score is
    simply not a quadratic around the true corner, so extraction keeps
    integer locations like the reference (`src/ORBextractor.cc:765`).
    Sub-pixel accuracy, if pursued, must come from intensity-based match
    refinement, not from this score map."""
    h, w = score.shape
    x = jnp.clip(uv[:, 0].astype(jnp.int32), 1, w - 2)
    y = jnp.clip(uv[:, 1].astype(jnp.int32), 1, h - 2)

    def at(dy, dx):
        return score[y + dy, x + dx]

    s0 = at(0, 0)
    dxs = 0.5 * (at(0, 1) - at(0, -1))
    dys = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = at(0, 1) - 2 * s0 + at(0, -1)
    dyy = at(1, 0) - 2 * s0 + at(-1, 0)
    ox = jnp.clip(-dxs / jnp.where(jnp.abs(dxx) < 1e-6, 1e-6, dxx), -0.5, 0.5)
    oy = jnp.clip(-dys / jnp.where(jnp.abs(dyy) < 1e-6, 1e-6, dyy), -0.5, 0.5)
    # NMS zeros the neighbors of weak maxima; refine only where the
    # parabola is concave (dxx/dyy < 0 gives a maximum)
    ox = jnp.where(dxx < 0, ox, 0.0)
    oy = jnp.where(dyy < 0, oy, 0.0)
    return uv + jnp.stack([ox, oy], -1)


def scale_factors(cfg: ExtractorConfig):
    """(n_levels,) scale factor per octave (1.2^l), and sigma2 = scale^2 —
    the per-octave measurement variance used in every chi2 gate
    (`src/ORBextractor.cc` mvScaleFactor / mvLevelSigma2)."""
    s = np.array([cfg.scale ** l for l in range(cfg.n_levels)], np.float32)
    return jnp.asarray(s), jnp.asarray(s * s)
