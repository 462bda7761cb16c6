"""System facade: the reference's public API (`include/System.h:66-134`)
over the TPU-native pipeline.

`System(settings).track_monocular(img, t)` mirrors
`System::TrackMonocular` (`src/System.cc:231`).  Internally there are no
threads and no locks: the host loop owns a functional :class:`MapState` and
invokes jitted device programs — extraction, tracking, keyframe insertion,
triangulation, local BA, culling — in the same order the reference's
Tracking/LocalMapping threads interleave them (bounded-lag semantics:
mapping runs synchronously at keyframe creation, which the reference
approximates with its AcceptKeyFrames idle check).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_mod, se3
from ..mapstate import state as mstate
from ..models import mapping, tracking
from ..ops import extract
from ..ops import lines as line_ops
from ..solvers import twoview


@dataclass
class SLAMConfig:
    # camera (TUM1-like defaults)
    fx: float = 517.306408
    fy: float = 516.469215
    cx: float = 318.643040
    cy: float = 255.313989
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    # extraction
    n_features: int = 1024
    n_levels: int = 8
    scale_factor: float = 1.2
    th_fast_high: float = 20.0
    th_fast_low: float = 7.0
    subpixel: bool = False          # quadratic sub-pixel keypoint refinement
                                    # on the pre-NMS FAST score (descriptors
                                    # keep integer sampling); YAML key
                                    # ORBextractor.subpixel. Measured worse
                                    # on the photo head-to-head, though
                                    # within the single-run ATE noise floor
                                    # (ops/extract.refine_subpixel) — keep off
    sel_order: str = "uniform"      # keypoint selection priority under the
                                    # per-cell cap: "uniform" = champion-per-
                                    # cell first (quadtree-parity),
                                    # "response" = strongest-first (cv2
                                    # retainBest order; 74% vs 57% selected-
                                    # set repeatability). Round-5 campaign:
                                    # with desc_pattern=learned, uniform/8
                                    # (mean kf ATE 0.0083, ratios 1.9-2.8x
                                    # vs the C++ reference, spread 1.5x)
                                    # and response/4 (0.0092, 1.3-3.4x) are
                                    # statistically tied; uniform ships as
                                    # the default for its tighter worst
                                    # case + no clustering risk. Response
                                    # WITHOUT the learned pattern was
                                    # REJECTED (one 0.466 blow-up seed) —
                                    # never flip sel_order alone
                                    # (BASELINE.md round-5 table).
    sel_cap: int = 8                # max keypoints drawn from one 32-px
                                    # selection cell (ops/select.py
                                    # k_per_cell); the spatial-spread
                                    # backstop under sel_order="response"
    desc_pattern: str = "learned"   # descriptor binary-test pattern:
                                    # "gauss" | "learned" (see
                                    # ops/extract.ExtractorConfig)
    level_map: int = 1              # pyramid level->base coordinate mapping
                                    # (ops/extract.ExtractorConfig.level_map):
                                    # 0 naive reference parity, 1 actual-ratio
                                    # (default: kills the measured per-octave
                                    # tilt bias), 2 exact half-pixel
    # map capacities (initial; grown on demand when grow_map=True)
    max_kf: int = 48
    max_pt: int = 12288
    max_ln: int = 1024
    n_lf: int = 256
    grow_map: bool = True           # double-and-pad capacity growth (the
                                    # reference's map is unbounded; SURVEY §7
                                    # hard part 5). Each growth event costs
                                    # one recompile of the keyframe programs.
    hard_max_kf: int = 4096         # growth ceilings (HBM safety).
    # hard_max_pt bounds the (N, P) Hamming/pixel-distance matrices that
    # tracking / relocalize / sim3 / loop_fuse build against the FULL point
    # array: at N=1024 each (N, P) int32 is P*4 KB — 256 MB at 64k points,
    # several live per program. 64k is the largest the v5-lite HBM budget
    # sustains with headroom (ADVICE r2: the former 262144 ceiling would
    # OOM the chip well before being reached).
    hard_max_pt: int = 65536
    hard_max_ln: int = 8192
    # policy
    min_init_matches: int = 100
    min_track_inliers: int = 10
    # catastrophic-jump guard (models/tracking.py): reject a pose update
    # whose single-frame motion exceeds these caps (map units ~ unit median
    # scene depth after monocular init; ~10x any real 30 fps inter-frame
    # motion). Rejected frames coast on constant velocity, bind nothing,
    # and report 0 inliers so the LOST->reloc ladder sees them.
    max_step_t: float = 0.15
    max_step_r: float = 0.35
    matcher_backend: str = "xla"  # projection-gated Hamming search backend
                                  # in tracking: "xla" (fused by the
                                  # compiler; measured 1.8 ms @ 1024x8192
                                  # on v5e) or "pallas"
                                  # (ops/pallas_match.py, the
                                  # hand-scheduled fused kernel; ~550x
                                  # slower on this f32-only Mosaic build —
                                  # kept as a selectable backend +
                                  # exactness reference, see its docstring)
    reloc_min_inliers: int = 50  # acceptance ladder (src/Tracking.cc:2229)
    loop_max_drift_rot: float = 0.8  # rad; reject an accepted loop Sim3
                                 # whose rotation disagrees with the map's
                                 # own relative-pose estimate by more than
                                 # this (perceptual-aliasing guard — a
                                 # wall-aliased match implies ~90-180 deg;
                                 # true closures differ only by drift)
    # keyframe cadence: a 6-frame floor keeps consecutive-KF baselines
    # wide enough to triangulate well-conditioned landmarks (measured on
    # the photo-room head-to-head, scripts/ref_compare.py: min_interval 3
    # -> 6 alone cut keyframe ATE 6x; the reference's effective cadence on
    # the same sequence was ~23 frames/KF)
    kf_min_interval: int = 6  # mapper-idle rate limit equivalent
    kf_max_interval: int = 12
    kf_ref_ratio: float = 0.9
    ba_window: int = 8
    ba_points: int = 3072
    ba_lines: int = 256
    use_lines: bool = True
    desc_majority: bool = False  # map-point representative descriptor:
                                 # False = latest observation; True =
                                 # bitwise majority at >= 3 observations
                                 # (the reference-medoid analog; helps
                                 # point-poor scenes, hurts under strong
                                 # viewpoint drift — see mapping.
                                 # insert_keyframe)
    track_line_info: float = 1.0  # line-edge weight in pose optimization —
                                  # reference parity (`src/Optimizer.cc:802`
                                  # uses identity information); measured
                                  # better than the round-1 0.25 on every
                                  # low-texture probe seed (the tighter
                                  # effective chi2 gate admits only
                                  # well-localized lines)
    use_loop_closing: bool = True
    tri_covis: bool = True          # triangulation partners = top-3 TRUE
                                    # covisible keyframes (deepest baseline
                                    # first) instead of the fixed {8,4,2}-
                                    # back recency ladder — the reference's
                                    # GetBestCovisibilityKeyFrames choice
                                    # (src/LocalMapping.cc:333). Default ON
                                    # by the round-4 5-seed campaign: the
                                    # only condition with NO catastrophic
                                    # tracking-loss run (max kf ATE 0.062
                                    # vs 1.24 for the recency ladder);
                                    # geomean paired ratio 0.50 vs default
                                    # (BASELINE.md round-4 table).
    sin_covis: bool = True          # SearchInNeighbors reverse-rebind
                                    # targets = top covisible keyframes
                                    # instead of the predecessor keyframes
                                    # (the reference's target set IS the
                                    # covisible neighborhood,
                                    # src/LocalMapping.cc:1505-1540).
                                    # Round-4 (gauss pattern): 2/5 seeds
                                    # catastrophically collapsed -> was
                                    # default-off. Round-5 root cause:
                                    # descriptor aliasing in the rebinds;
                                    # with the learned pattern + jump
                                    # guard the same lever wins 5/5 seeds
                                    # (mean kf ATE 0.0069 vs 0.0083,
                                    # ratios 1.5-2.3x vs the reference,
                                    # BASELINE.md round-5 wave 3) ->
                                    # default-on
    sin_reverse_n: int = 2          # SearchInNeighbors reverse-direction
                                    # target count: how many keyframes the
                                    # NEW keyframe's points are bound into
                                    # (the reference fuses into every
                                    # target keyframe,
                                    # src/LocalMapping.cc:1552-1557) — the
                                    # direct landmark-observation-density
                                    # lever (VERDICT r4 item 7)
    sin_whole_map: bool = False     # SearchInNeighbors forward fuse
                                    # against the WHOLE map (pre-round-4
                                    # behavior) instead of the reference's
                                    # 10-best-covisible + 2-hop target set
                                    # (src/LocalMapping.cc:1508-1540).
                                    # Whole-map fusion silently absorbs
                                    # loop drift through data association
                                    # (kept only for A/B)
    tri_covis_k: int = 3            # how many covisible partners (the
                                    # reference iterates 10-20 covisible
                                    # neighbors, src/LocalMapping.cc:333;
                                    # each extra partner costs one more
                                    # create_new_points program in the
                                    # keyframe chain)
    young_gba_until_kf: int = 0     # 0 = off. Run a synchronous full-map BA after
                                    # each keyframe while n_kf <= this.
                                    # The reference's local BA covers ALL
                                    # covisible keyframes — on a young map
                                    # that is the whole map, continuously
                                    # re-harmonizing the noisy initial
                                    # landmarks/scale as wider baselines
                                    # arrive (src/Optimizer.cc:1645 window
                                    # construction). Our fixed window slides
                                    # past the early keyframes and freezes
                                    # their scale error in — measured as the
                                    # front-loaded error profile of the bad
                                    # runs (scripts/run_profile.py; BASELINE
                                    # round-3 caveat). Cheap: the map is
                                    # small exactly when this runs.
    periodic_gba_every_kf: int = 0  # 0 = off. Launch an async background
                                    # global BA every N keyframes even
                                    # without a loop closure (see
                                    # _maybe_keyframe; rounds are dispatched
                                    # one per tracked frame, off the
                                    # critical path). Measured neutral on
                                    # the 170-frame head-to-head probe
                                    # (0.0311 off vs 0.0316 every-8) —
                                    # default off; an offline-mapping
                                    # profile may want it on
    localization_only: bool = False  # ActivateLocalizationMode equivalent
    async_pipeline: bool = False  # defer per-frame decisions by one frame:
                                  # hides the device->host readback latency
                                  # behind the next frame's compute
    async_depth: int = 1          # frames per decision readback (the relay's
                                  # ~25ms roundtrip amortizes across N frames)
    # depth sensors (stereo / RGB-D), cf ThDepth/DepthMapFactor/bf in the
    # reference YAML (src/Tracking.cc:105-170)
    baseline: float = 0.08          # stereo baseline [m]
    th_depth: float = 40.0          # max trusted depth for direct creation
    depth_map_factor: float = 1.0   # RGBD depth image scaling
    rgb_order: bool = True          # Camera.RGB (color conversion order)
    ln_detect_min_length: float = 24.0  # detector length floor in px
                                    # (ops/lines.py). Measured on the photo
                                    # frames (scripts/line_density_probe.py):
                                    # 24 -> ~58 segments, 16 -> ~116,
                                    # block=4 + 16 -> ~179 (the reference's
                                    # LSD yields up to 200) — the detection
                                    # side of the line-density lever
                                    # (VERDICT r4 item 6)
    ln_detect_block: int = 8        # structure-tensor block size in px;
                                    # 4 = finer chains, ~2x segments, ~4x
                                    # block-stage compute
    min_line_length: float = 0.0    # LINEextractor.min_line_length (fraction
                                    # of min(W,H), as the reference interprets
                                    # it in src/LineExtractor.cpp:39-67)
    line_n_levels: int = 1          # LINEextractor.nLevels (detector octaves)
    line_scale: float = 1.2         # LINEextractor.scaleFactor
    mask_path: str = ""             # optional LSD suppression mask (masks/)
    sensor: str = "mono"            # "mono" | "stereo" | "rgbd" — drives
                                    # bFixScale = (sensor != MONOCULAR)
                                    # (`src/System.cc:106`): depth sensors
                                    # observe metric scale, so loop Sim3 and
                                    # the essential graph run with s == 1
    seed: int = 0

    @staticmethod
    def from_yaml(path: str) -> "SLAMConfig":
        """Load the reference's YAML schema (`Examples/Monocular/TUM1.yaml`
        keys, read by `src/Tracking.cc:53-170`)."""
        import yaml
        with open(path) as f:
            text = f.read()
        # OpenCV FileStorage yaml has a %YAML directive line; strip it
        lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
        d = yaml.safe_load("\n".join(lines)) or {}
        g = lambda k, default: d.get(k, default)
        fx = g("Camera.fx", 517.3)
        # depth-sensor keys (src/Tracking.cc:105-170): mbf = Camera.bf,
        # mThDepth = mbf * ThDepth / fx [m]; DepthMapFactor divides the
        # RGBD depth image into meters
        bf = float(g("Camera.bf", 0.0))
        th_depth_units = float(g("ThDepth", 40.0))
        th_depth = bf * th_depth_units / fx if bf > 0 else 40.0
        dmf = float(g("DepthMapFactor", 1.0))
        return SLAMConfig(
            fx=fx, fy=g("Camera.fy", 516.5),
            cx=g("Camera.cx", 318.6), cy=g("Camera.cy", 255.3),
            k1=g("Camera.k1", 0.0), k2=g("Camera.k2", 0.0),
            p1=g("Camera.p1", 0.0), p2=g("Camera.p2", 0.0),
            k3=g("Camera.k3", 0.0),
            width=int(g("Camera.width", 640)), height=int(g("Camera.height", 480)),
            fps=g("Camera.fps", 30.0),
            rgb_order=bool(int(g("Camera.RGB", 1))),
            baseline=(bf / fx) if bf > 0 else 0.08,
            th_depth=th_depth,
            depth_map_factor=dmf if dmf > 0 else 1.0,
            # round the YAML budget (1000 in the reference configs) up to a
            # multiple of 256 — static shapes want aligned sizes
            n_features=-(-int(g("ORBextractor.nFeatures", 1000)) // 256) * 256,
            n_levels=int(g("ORBextractor.nLevels", 8)),
            scale_factor=g("ORBextractor.scaleFactor", 1.2),
            th_fast_high=g("ORBextractor.iniThFAST", 20.0),
            th_fast_low=g("ORBextractor.minThFAST", 7.0),
            subpixel=bool(int(g("ORBextractor.subpixel", 0))),
            # LINEextractor.* (read at src/Tracking.cc:157-170); static line
            # slots rounded up to a multiple of 64
            n_lf=-(-int(g("LINEextractor.nFeatures", 200)) // 64) * 64,
            line_n_levels=int(g("LINEextractor.nLevels", 1)),
            line_scale=g("LINEextractor.scaleFactor", 1.2),
            min_line_length=float(g("LINEextractor.min_line_length", 0.0)),
        )


NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


class System:
    """Monocular point(+line) SLAM. Public surface mirrors the reference:
    `track_monocular`, `shutdown`, `save_keyframe_trajectory_tum`,
    `save_trajectory_tum`, `reset`, localization mode toggles."""

    def __init__(self, config: SLAMConfig = SLAMConfig(), use_jit: bool = True):
        self.cfg = config
        self.cam = cam_mod.Camera.create(
            config.fx, config.fy, config.cx, config.cy, config.k1, config.k2,
            config.p1, config.p2, config.k3, config.width, config.height)
        self.ext_cfg = extract.ExtractorConfig(
            n_features=config.n_features, n_levels=config.n_levels,
            scale=config.scale_factor, th_fast_high=config.th_fast_high,
            th_fast_low=config.th_fast_low, subpixel=config.subpixel,
            level_map=config.level_map, sel_order=config.sel_order,
            sel_cap=config.sel_cap, desc_pattern=config.desc_pattern)
        self.map_cfg = mstate.MapConfig(
            max_kf=config.max_kf, max_pt=config.max_pt, max_ln=config.max_ln,
            n_kp=config.n_features, n_lf=config.n_lf,
            n_levels=config.n_levels, scale=config.scale_factor)
        self.scale_factors, self.sigma2 = extract.scale_factors(self.ext_cfg)

        self._line_mask = None
        if config.mask_path:
            import cv2
            m = cv2.imread(config.mask_path, 0)
            if m is not None:
                self._line_mask = jnp.asarray((m > 127).astype(np.float32))

        jit = jax.jit if use_jit else (lambda f, **kw: f)
        cam = self.cam
        # fx * baseline — the reference's mbf (`src/Tracking.cc:105-170`);
        # activates 3-dof stereo edges in pose opt + BA for depth sensors
        self._bf = float(config.fx) * float(config.baseline)
        self._extract = jit(self._extract_impl)
        track_fn = partial(
            tracking.track_local_map, cam,
            scale_factors=self.scale_factors, sigma2_levels=self.sigma2,
            n_levels=config.n_levels, scale=config.scale_factor,
            line_info=config.track_line_info,
            max_step_t=config.max_step_t, max_step_r=config.max_step_r,
            matcher_backend=config.matcher_backend)
        self._track = jit(track_fn)
        # tracking + stats update in one program, map state donated in HBM
        self._track_update = jax.jit(
            partial(track_fn, update_stats=True),
            donate_argnums=(0,)) if use_jit else partial(
            track_fn, update_stats=True)

        # Chunked fast path: extraction + tracking for a BLOCK of frames as
        # ONE dispatched program (`lax.scan` over frames, sequential
        # semantics preserved on device). On the relay-tunneled TPU each
        # program dispatch costs ~8-10 ms of host wall time while the
        # per-frame device compute is ~8 ms — per-frame dispatch caps the
        # pipeline at ~40 fps regardless of device speed. Chunking amortizes
        # one dispatch over B frames (scripts/perf_breakdown.py).
        def chunk_impl(ms, imgs, T_last, velocity, anchor_kf):
            def body(carry, img):
                ms_c, T_l, vel = carry
                feats, lfeats = self._extract_impl(img)
                res, ms2 = track_fn(ms_c, feats, T_l, lfeats=lfeats,
                                    velocity=vel, update_stats=True,
                                    anchor_kf=anchor_kf)
                out = (res.T, res.T_rel, res.scalars, res.matched_pt,
                       res.matched_ln, feats, lfeats)
                return (ms2, res.T, res.velocity), out
            carry, outs = jax.lax.scan(body, (ms, T_last, velocity), imgs)
            return carry, outs
        self._track_chunk = jax.jit(chunk_impl, donate_argnums=(0,)) \
            if use_jit else chunk_impl
        # one-dispatch gather of frame j's features out of a chunk's stacked
        # outputs (naive per-array indexing costs ~13 dispatches per KF)
        self._slice_chunk = jit(lambda fs, ls, m_pt, m_ln, Ts, j: (
            jax.tree_util.tree_map(lambda a: a[j], fs),
            jax.tree_util.tree_map(lambda a: a[j], ls),
            m_pt[j], m_ln[j], Ts[j]))
        self._update_stats = jit(tracking.update_point_stats)
        self._match_frames = jit(tracking.match_frames)
        self._init_two_view = jit(partial(twoview.initialize_two_view, K=jnp.asarray(np.asarray(cam.K))))
        self._insert_kf = jit(partial(
            mapping.insert_keyframe, cam, scale_factors=self.scale_factors,
            bf=self._bf))
        self._create_points = jit(partial(
            mapping.create_new_points, cam, sigma2_levels=self.sigma2,
            scale_factors=self.scale_factors))
        self._create_lines = jit(partial(mapping.create_new_lines, cam))
        self._local_ba = jit(partial(
            mapping.run_local_ba, cam, sigma2_levels=self.sigma2,
            window=config.ba_window, p_ba=config.ba_points,
            l_ba=config.ba_lines))
        self._cull = jit(mapping.cull_points)
        self._cull_kf = jit(partial(mapping.cull_keyframes))
        self._fuse = jit(partial(mapping.fuse_duplicate_points,
                                 n_recent=min(1024, config.max_pt)))
        # the fused keyframe chain (donated map state: in-place HBM update)
        self._process_kf = {}
        for ud in (False, True):
            self._process_kf[ud] = jax.jit(
                partial(mapping.process_keyframe, cam,
                        sigma2_levels=self.sigma2,
                        scale_factors=self.scale_factors,
                        window=config.ba_window, p_ba=config.ba_points,
                        l_ba=config.ba_lines, max_depth=config.th_depth,
                        use_depth=ud, bf=self._bf,
                        desc_majority=config.desc_majority,
                        tri_covis=config.tri_covis,
                        tri_covis_k=config.tri_covis_k,
                        sin_covis=config.sin_covis,
                        sin_whole_map=config.sin_whole_map,
                        sin_reverse_n=config.sin_reverse_n),
                static_argnames=(), donate_argnums=(0,)) if use_jit else \
                partial(mapping.process_keyframe, cam,
                        sigma2_levels=self.sigma2,
                        scale_factors=self.scale_factors,
                        window=config.ba_window, p_ba=config.ba_points,
                        l_ba=config.ba_lines, max_depth=config.th_depth,
                        use_depth=ud, bf=self._bf,
                        desc_majority=config.desc_majority,
                        tri_covis=config.tri_covis,
                        tri_covis_k=config.tri_covis_k,
                        sin_covis=config.sin_covis,
                        sin_whole_map=config.sin_whole_map,
                        sin_reverse_n=config.sin_reverse_n)
        self._relocalize = jit(partial(
            tracking.relocalize, cam, sigma2_levels=self.sigma2,
            scale_factors=self.scale_factors, n_levels=config.n_levels,
            scale=config.scale_factor,
            min_inliers=config.reloc_min_inliers))
        from ..ops import stereo as stereo_ops
        self._depth_at = jit(stereo_ops.depth_at)
        bf_ = self._bf
        self._ur_from_depth = jit(lambda feats, d: jnp.where(
            feats.valid & (d > 0),
            feats.uv_un[:, 0] - bf_ / jnp.maximum(d, 1e-6), -1.0))
        self._stereo_match = jit(partial(
            stereo_ops.stereo_match, fx=float(config.fx),
            baseline=config.baseline, scale_factors=self.scale_factors))
        self._create_depth_points = jit(partial(
            mapping.create_points_from_depth, cam,
            scale_factors=self.scale_factors, max_depth=config.th_depth))
        # full-map BA for loop closure / global BA. Budgets are the MAP
        # capacities (capped for HBM), not the local-BA window budgets: a
        # whole-map window under the local cap would silently drop most
        # landmarks — including the fused cross-loop ones — and leave the
        # early keyframes unconstrained.
        self._gba_points = lambda: min(self.map_cfg.max_pt, 16384)
        self._gba_lines = lambda: min(self.map_cfg.max_ln, 1024)
        self._global_ba = jit(partial(
            mapping.run_local_ba, cam, sigma2_levels=self.sigma2,
            window=min(config.max_kf, 128), p_ba=self._gba_points(),
            l_ba=self._gba_lines(), rank_by_obs=True))
        # asynchronous global BA (P3): the reference runs GBA in a
        # detachable thread with an abort flag (`RunGlobalBundleAdjustment`,
        # src/LoopClosing.cc:575-645); here the LM loop is cut into
        # resumable per-round programs dispatched between tracking frames —
        # cooperative cancellation = the host stops dispatching rounds
        from ..optim import local_ba as local_ba_mod
        self._gba_select = jit(partial(
            mapping.ba_select, sigma2_levels=self.sigma2,
            window=min(config.max_kf, 128), p_ba=self._gba_points(),
            l_ba=self._gba_lines(), rank_by_obs=True))
        # NOTE: the reference's loop GBA runs robust=false with no outlier
        # pass (`src/LoopClosing.cc:651`); here the rounds stay robust and
        # one chi2 demotion runs after round 1 — measured on the loop
        # fixture (scripts/loop_debug.py) the plain-quadratic variant lets
        # aliased matches drag the solution (final kf ATE 0.167 vs 0.110)
        self._gba_init = jit(lambda prob: local_ba_mod.ba_init(prob, cam))
        self._gba_round = jit(lambda prob, st: local_ba_mod.ba_rounds(
            prob, cam, st, 3, robust=True))
        self._gba_demote = jit(lambda prob, st: local_ba_mod.ba_demote(
            prob, cam, st))
        self._gba_final = jit(lambda prob, st: local_ba_mod.ba_finalize(
            prob, cam, st))
        self._gba_merge = jit(mapping.gba_merge)
        from ..models.loop_closing import LoopClosing
        # bFixScale = (sensor != MONOCULAR) (`src/System.cc:106`): with a
        # depth sensor the map scale is observed, so loop-closure Sim3
        # refinement and the essential graph must not introduce a scale DOF
        self.loop_closer = LoopClosing(
            cam, self.map_cfg, self.sigma2, self._global_ba,
            use_jit=use_jit,
            fix_scale=(config.sensor != "mono"),
            max_drift_rot=config.loop_max_drift_rot) \
            if config.use_loop_closing else None

        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        """`System::Reset` equivalent (`src/Tracking.cc:2246`)."""
        self.ms = mstate.allocate(self.map_cfg)
        self.state = NOT_INITIALIZED
        self.velocity = jnp.eye(4)
        self.T_last = jnp.eye(4)
        self.frame_id = -1
        self.n_kf_host = 0
        self.last_kf_frame = -1
        self.last_reloc_frame = -10**9
        self.ref_kf_matches = 0
        self._init_feats = None
        self._init_lfeats = None
        self._kp_depth = None
        self._kp_ur = None
        self._pending = []
        self._chunk_pending = []
        self._init_frame_id = -1
        self._anchor_kf = None    # local-map anchor override: set to the
                                  # relocalization keyframe after a kidnap
                                  # recovery, cleared at the next keyframe
                                  # (ADVICE r2: recency window alone loses
                                  # tracking after reloc into an old region)
        self._occupancy = (0, 0)  # (n_pt, n_ln) from the last readback
        self.n_growths = 0
        self._gba = None          # in-flight async global BA state
        self.n_gba_done = 0
        # Per-frame trajectory is stored RELATIVE to the reference keyframe
        # at track time and re-anchored against the CURRENT keyframe poses
        # on read (`src/Tracking.cc:580-595`, `src/System.cc:363-392`) — so
        # loop-closure / GBA corrections retro-correct past frames.
        # Entries: (timestamp, T_rel 4x4 | None, ref_kf id, lost flag).
        self._traj: list[tuple] = []
        self.kf_timestamps: list[float] = []
        self.timings: list[float] = []
        self.stats: list[dict] = []

    # ------------------------------------------------------------------
    def _extract_impl(self, img):
        img = img.astype(jnp.float32)  # uint8 upload, f32 compute
        feats = extract.extract_points(img, self.ext_cfg)
        uv_un = cam_mod.undistort_pixels(self.cam, feats.uv)
        feats = feats._replace(uv_un=uv_un)
        if self.cfg.use_lines:
            # reference scales min_line_length by min(W,H)
            # (`src/LineExtractor.cpp:39-67`); 0 keeps the detector default
            mll = self.cfg.min_line_length * min(self.cfg.width,
                                                 self.cfg.height)
            lf = line_ops.detect_lines(
                img, n_out=self.cfg.n_lf, mask=self._line_mask,
                block=self.cfg.ln_detect_block,
                min_length=max(self.cfg.ln_detect_min_length, mll))
            # undistort endpoints, refresh the infinite-line equation
            ua = cam_mod.undistort_pixels(self.cam, lf.uv_a)
            ub = cam_mod.undistort_pixels(self.cam, lf.uv_b)
            from ..geometry import triangulation as _tri
            lf = lf._replace(uv_a=ua, uv_b=ub,
                             l2d=_tri.line_from_endpoints_2d(ua, ub))
        else:
            lf = None
        return feats, lf

    # ------------------------------------------------------------------
    def track_monocular(self, img, timestamp: float) -> Optional[np.ndarray]:
        """Process one grayscale frame; returns the 4x4 camera pose Tcw or
        None while uninitialized (matching `TrackMonocular` returning an
        empty Mat before init)."""
        t0 = time.perf_counter()
        self.frame_id += 1
        # uint8 on the wire: host->device bandwidth is the per-frame floor.
        # Device-resident arrays pass straight through (pre-staged input
        # pipelines / the native prefetch loader feeding device_put).
        if not isinstance(img, jax.Array):
            img = jax.device_put(np.asarray(img).astype(np.uint8))
        feats, lfeats = self._extract(img)

        if self.state == NOT_INITIALIZED:
            T = self._try_initialize(feats, lfeats, timestamp)
        else:
            T = self._track_frame(feats, lfeats, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return T

    # ------------------------------------------------------------------
    def track_synced(self, img, timestamp: float) -> Optional[np.ndarray]:
        """Live-camera path: one frame in, pose out, ALL per-frame decisions
        (keyframe / lost) resolved before returning — the reference's
        TrackMonocular contract at minimum dispatch count.

        `track_monocular` costs two relay dispatches per frame (extract,
        track) plus readbacks; here extraction + tracking run as ONE fused
        program (the B=1 case of the chunked `lax.scan` pipeline) and the
        decision scalars are read back immediately. Measured on the
        relay-tunneled chip this roughly halves the synced latency."""
        if self.state != OK:
            return self.track_monocular(img, timestamp)
        t0 = time.perf_counter()
        if not isinstance(img, jax.Array):
            img = jax.device_put(np.asarray(img).astype(np.uint8))
        out = self.track_chunked(img[None], [timestamp])
        self._resolve_chunks(keep=0)
        T = np.asarray(out[0]) if not isinstance(out, list) else out[0]
        # overwrite the two timing entries track_chunked appended
        if self.timings:
            self.timings[-1] = time.perf_counter() - t0
        return T

    # ------------------------------------------------------------------
    def track_chunked(self, imgs, timestamps):
        """Process a block of consecutive frames with ONE dispatched device
        program (extraction + tracking per frame via `lax.scan`; sequential
        semantics preserved on device). Keyframe/LOST decisions read back
        one chunk late — the same bounded-lag keyframing as
        `async_pipeline`, amortized over the block. Falls back to the
        per-frame path while uninitialized or lost.

        `imgs`: (B, H, W) uint8 (device array preferred); `timestamps`:
        length-B sequence. Returns the (B, 4, 4) poses (device array on the
        fast path, list of per-frame results on the fallback path)."""
        B = int(imgs.shape[0])
        if self.state != OK:
            return [self.track_monocular(imgs[j], timestamps[j])
                    for j in range(B)]
        if not isinstance(imgs, jax.Array):
            imgs = jax.device_put(np.asarray(imgs).astype(np.uint8))
        t0 = time.perf_counter()
        ids = [self.frame_id + 1 + j for j in range(B)]
        self.frame_id += B
        (ms, T_last, vel), outs = self._track_chunk(
            self.ms, imgs, self.T_last, self.velocity, self._anchor_arg())
        self.ms = ms
        self.T_last = T_last
        self.velocity = vel
        Ts, T_rels, scalars, m_pt, m_ln, feats_s, lfeats_s = outs
        self._step_gba()
        ref = self.n_kf_host - 1
        traj_start = len(self._traj)
        for j, ts in enumerate(timestamps):
            # ("chunk", stack, j): lazy reference — indexing the device
            # array here would dispatch one gather per frame, which is
            # exactly the per-call overhead chunking exists to avoid
            self._log_frame(ts, ("chunk", T_rels, j), ref)
        try:
            # start the (6,B) scalars flowing to the host now; by the time
            # the NEXT chunk resolves decisions the transfer has landed and
            # np.asarray is free instead of a blocking relay roundtrip
            scalars.copy_to_host_async()
        except Exception:
            pass
        self._chunk_pending.append(
            (scalars, Ts, m_pt, m_ln, feats_s, lfeats_s,
             list(timestamps), ids, traj_start))
        if len(self._chunk_pending) > 1:
            self._resolve_chunks(keep=1)
        dt = (time.perf_counter() - t0) / B
        self.timings.extend([dt] * B)
        return Ts

    def _resolve_chunks(self, keep: int = 0):
        import types
        while len(self._chunk_pending) > keep:
            (scalars, Ts, m_pt, m_ln, feats_s, lfeats_s, tss, ids,
             traj_start) = self._chunk_pending.pop(0)
            sc = np.asarray(scalars)          # ONE readback per chunk
            saved_fid = self.frame_id
            for j in range(sc.shape[0]):
                n_inl, n_ln_inl, n_matched, nref3, n_pt, n_ln = (
                    int(x) for x in sc[j])
                self._occupancy = (n_pt, n_ln)
                if n_inl < self.cfg.min_track_inliers:
                    self.state = LOST
                    # retro-mark the optimistically-logged trajectory entry:
                    # the chunk's remaining device poses are garbage once
                    # tracking failed — export repeats the last recovered
                    # pose instead (src/System.cc:372 parity; ADVICE r2)
                    ts_e, _, ref_e, _ = self._traj[traj_start + j]
                    self._traj[traj_start + j] = (ts_e, None, ref_e, True)
                    self.stats.append({"inliers": n_inl, "kf": False,
                                       "lost": True})
                    continue
                self.state = OK
                made_kf = False
                if not self.cfg.localization_only:
                    # decisions run under the frame's own id (cadence gates)
                    self.frame_id = ids[j]
                    # cheap host-side pre-gate before paying the slice
                    # dispatch: replicate _maybe_keyframe's cadence + c2
                    since = ids[j] - self.last_kf_frame
                    ref_base = nref3 if nref3 >= 30 else max(
                        self.ref_kf_matches, 15)
                    maybe = (n_inl < self.cfg.kf_ref_ratio * ref_base
                             and n_inl > 15
                             and since >= self.cfg.kf_min_interval)
                    if maybe:
                        f_j, l_j, mp_j, ml_j, T_j = self._slice_chunk(
                            feats_s, lfeats_s, m_pt, m_ln, Ts,
                            jnp.int32(j))
                        res_j = types.SimpleNamespace(
                            T=T_j, matched_pt=mp_j, matched_ln=ml_j)
                        made_kf = self._maybe_keyframe(
                            f_j, l_j, res_j, tss[j],
                            n_inl, n_matched, nref3)
                self.stats.append({"inliers": n_inl, "kf": made_kf,
                                   "lost": False,
                                   "line_inliers": n_ln_inl})
            self.frame_id = saved_fid

    # ------------------------------------------------------------------
    def track_rgbd(self, img, depth, timestamp: float):
        """`System::TrackRGBD` (`src/System.cc:185`): metric depth enables
        immediate single-frame initialization and direct landmark creation."""
        t0 = time.perf_counter()
        self.frame_id += 1
        self._ensure_depth_sensor("rgbd")
        img = jnp.asarray(np.asarray(img).astype(np.uint8))
        depth = jnp.asarray(np.asarray(depth).astype(np.float32)
                            / self.cfg.depth_map_factor)
        feats, lfeats = self._extract(img)
        self._kp_depth = self._depth_at(depth, feats.uv)
        self._kp_ur = self._ur_from_depth(feats, self._kp_depth)
        if self.state == NOT_INITIALIZED:
            T = self._initialize_with_depth(feats, lfeats, timestamp)
        else:
            T = self._track_frame(feats, lfeats, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return T

    def track_stereo(self, img_left, img_right, timestamp: float):
        """`System::TrackStereo` (`src/System.cc:139`): rectified pair ->
        per-keypoint depth via MXU row-masked matching + SAD refinement."""
        t0 = time.perf_counter()
        self.frame_id += 1
        self._ensure_depth_sensor("stereo")
        im_l = jnp.asarray(np.asarray(img_left).astype(np.uint8))
        im_r = jnp.asarray(np.asarray(img_right).astype(np.uint8))
        feats, lfeats = self._extract(im_l)
        feats_r, _ = self._extract(im_r)
        d, _, ok = self._stereo_match(feats, feats_r,
                                      im_l.astype(jnp.float32),
                                      im_r.astype(jnp.float32))
        self._kp_depth = jnp.where(ok, d, -1.0)
        self._kp_ur = self._ur_from_depth(feats, self._kp_depth)
        if self.state == NOT_INITIALIZED:
            T = self._initialize_with_depth(feats, lfeats, timestamp)
        else:
            T = self._track_frame(feats, lfeats, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return T

    def _ensure_depth_sensor(self, sensor: str):
        """Depth-sensor calls on a default (mono) config flip the loop
        closer to fixed-scale Sim3 before its programs first trace —
        `bFixScale = (sensor != MONOCULAR)`, `src/System.cc:106`."""
        if self.cfg.sensor != sensor:
            self.cfg.sensor = sensor
            if self.loop_closer is not None:
                self.loop_closer.fix_scale = True
            # rebuild the whole-map BA programs with 3-dof stereo edges
            from functools import partial as _partial
            from ..models import mapping as _mapping
            self._global_ba = jax.jit(_partial(
                _mapping.run_local_ba, self.cam, sigma2_levels=self.sigma2,
                window=min(self.cfg.max_kf, 128), p_ba=self._gba_points(),
                l_ba=self._gba_lines(), rank_by_obs=True,
                use_stereo=True, bf=self._bf))
            self._gba_select = jax.jit(_partial(
                _mapping.ba_select, sigma2_levels=self.sigma2,
                window=min(self.cfg.max_kf, 128), p_ba=self._gba_points(),
                l_ba=self._gba_lines(), rank_by_obs=True,
                use_stereo=True, bf=self._bf))
            if self.loop_closer is not None:
                self.loop_closer._local_ba = self._global_ba

    def _initialize_with_depth(self, feats, lfeats, timestamp):
        """`Tracking::StereoInitialization`: one keyframe at the origin,
        landmarks straight from depth."""
        if int(jnp.sum(feats.valid)) < 300:
            return None
        N = self.map_cfg.n_kp
        ms = self._insert_kf(self.ms, feats, jnp.eye(4),
                             jnp.full((N,), -1, jnp.int32),
                             jnp.int32(self.frame_id),
                             lfeats=lfeats, matched_ln=None,
                             kp_depth=self._kp_depth)
        ms = self._create_depth_points(ms, jnp.int32(0), self._kp_depth)
        self.ms = ms
        self.n_kf_host = 1
        self.state = OK
        self.T_last = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_kf_frame = self.frame_id
        self.ref_kf_matches = int(jnp.sum(self.ms.kf_pt_idx[0] >= 0))
        self.kf_timestamps = [timestamp]
        self._log_frame(timestamp, np.eye(4, dtype=np.float32), 0)
        return np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------------
    def _try_initialize(self, feats, lfeats, timestamp):
        n_valid = int(jnp.sum(feats.valid))
        if self._init_feats is None or n_valid < self.cfg.min_init_matches:
            if n_valid >= self.cfg.min_init_matches:
                self._init_feats = feats
                self._init_lfeats = lfeats
                self._init_frame_id = self.frame_id
                self._init_ts = timestamp
            return None

        idx2, ok = self._match_frames(self._init_feats, feats)
        n_matches = int(jnp.sum(ok))
        if n_matches < self.cfg.min_init_matches:
            # too few matches: make the current frame the new anchor
            self._init_feats = feats
            self._init_lfeats = lfeats
            self._init_frame_id = self.frame_id
            self._init_ts = timestamp
            return None

        res = self._init_two_view(
            jax.random.PRNGKey(self.cfg.seed),
            self._init_feats.uv_un, feats.uv_un[idx2], ok)
        if not bool(res.success):
            return None

        self._create_initial_map(feats, lfeats, idx2, res, timestamp)
        self.state = OK
        T = np.asarray(self.ms.kf_T[1])
        self._log_frame(timestamp, np.eye(4, dtype=np.float32), 1)
        return T

    # ------------------------------------------------------------------
    def _create_initial_map(self, feats, lfeats, idx2,
                            res: twoview.TwoViewResult, timestamp):
        """`CreateInitialMapMonoWithLine` (`src/Tracking.cc:942`) minus lines:
        two keyframes, triangulated points normalized to unit median depth,
        then a full BA over the window."""
        good = np.asarray(res.good)
        X = np.asarray(res.X)
        z = X[good][:, 2]
        med_depth = float(np.median(z)) if good.any() else 1.0
        X = X / med_depth
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = np.asarray(res.R)
        T2[:3, 3] = np.asarray(res.t) / med_depth

        n_new = int(good.sum())
        N = self.map_cfg.n_kp
        # map point ids 0..n_new-1 assigned to good matches in slot order
        pid = np.full(N, -1, np.int32)
        pid[good] = np.arange(n_new, dtype=np.int32)

        f1 = self._init_feats
        matched1 = jnp.asarray(pid)
        ms = self._insert_kf(self.ms, f1, jnp.eye(4), matched1,
                             jnp.int32(self._init_frame_id),
                             lfeats=self._init_lfeats, matched_ln=None)
        # second KF: same points observed at idx2 slots
        pid2 = np.full(N, -1, np.int32)
        idx2_np = np.asarray(idx2)
        pid2[idx2_np[good]] = pid[good]
        ms = self._insert_kf(ms, feats, jnp.asarray(T2), jnp.asarray(pid2),
                             jnp.int32(self.frame_id),
                             lfeats=lfeats, matched_ln=None)

        # write landmark geometry (insert_kf only binds observations)
        sel = np.nonzero(good)[0]
        ms = ms._replace(
            pt_xyz=ms.pt_xyz.at[jnp.asarray(pid[sel])].set(jnp.asarray(X[sel])),
            n_pt=jnp.int32(n_new),
        )
        # scale-invariance range + normals from KF1 geometry
        d = np.linalg.norm(X[sel], axis=-1)
        oct1 = np.asarray(f1.octave)[sel]
        sf = np.asarray(self.scale_factors)
        max_dist = d * sf[oct1]
        min_dist = max_dist / sf[-1]
        normal = X[sel] / np.maximum(d[:, None], 1e-6)
        ids = jnp.asarray(pid[sel])
        ms = ms._replace(
            pt_min_dist=ms.pt_min_dist.at[ids].set(jnp.asarray(min_dist)),
            pt_max_dist=ms.pt_max_dist.at[ids].set(jnp.asarray(max_dist)),
            pt_normal=ms.pt_normal.at[ids].set(jnp.asarray(normal)),
            pt_valid=ms.pt_valid.at[ids].set(True),
            pt_first_kf=ms.pt_first_kf.at[ids].set(0),
            pt_n_obs=ms.pt_n_obs.at[ids].set(2),
            pt_visible=ms.pt_visible.at[ids].set(2),
            pt_found=ms.pt_found.at[ids].set(2),
        )
        if self.cfg.use_lines:
            # triangulate initial map lines between the two init keyframes
            # (CreateInitialMapMonoWithLine, src/Tracking.cc:942)
            ms = self._create_lines(ms, jnp.int32(1), jnp.int32(0))
        self.ms = self._local_ba(ms)

        self.T_last = self.ms.kf_T[1]
        self.velocity = jnp.eye(4)
        self.n_kf_host = 2
        self.last_kf_frame = self.frame_id
        self.ref_kf_matches = n_new
        self.kf_timestamps = [self._init_ts, timestamp]
        self._log_frame(self._init_ts, np.eye(4, dtype=np.float32), 0)

    # ------------------------------------------------------------------
    def _anchor_arg(self):
        """Local-map anchor as a traced scalar: -1 = latest keyframe
        (normal sequential tracking), otherwise the keyframe the last
        relocalization landed in (until the next keyframe insertion)."""
        a = self._anchor_kf if self._anchor_kf is not None else -1
        return jnp.int32(a)

    def _track_frame(self, feats, lfeats, timestamp):
        if self.state == LOST:
            return self._relocalize_frame(feats, timestamp)

        stereo_kw = {} if self._kp_ur is None else dict(
            kp_ur=self._kp_ur, bf=self._bf)
        res, self.ms = self._track_update(self.ms, feats, self.T_last,
                                          lfeats=lfeats,
                                          velocity=self.velocity,
                                          anchor_kf=self._anchor_arg(),
                                          **stereo_kw)
        # one background-GBA round per frame while one is in flight (the
        # dispatch is asynchronous; device work overlaps the readbacks)
        self._step_gba()
        T = res.T
        self.velocity = res.velocity  # damped model computed in-program
        self.T_last = T
        # device array, fetched lazily in one batch at save time
        self._log_frame(timestamp, res.T_rel, self.n_kf_host - 1)

        # Decisions (LOST / keyframe) need the inlier counts on the host —
        # the only device->host readback of the frame. In async mode the
        # PREVIOUS frame's readback is resolved now, AFTER this frame's
        # programs were dispatched — its latency hides behind them
        # (bounded-lag semantics: keyframes are created one frame late from
        # their stored features).
        self._pending.append((res, feats, lfeats, timestamp))
        if self.cfg.async_pipeline:
            # keep `async_depth` frames in flight; resolve the oldest batch
            # with ONE device->host fetch when the queue is full
            if len(self._pending) > self.cfg.async_depth:
                self._resolve_pending(keep=1)
        else:
            self._resolve_pending()
        return T

    def _resolve_pending(self, keep: int = 0):
        while len(self._pending) > keep:
            batch = self._pending[:len(self._pending) - keep]
            self._pending = self._pending[len(batch):]
            # one fused readback for the whole batch
            sc = np.asarray(jnp.stack([b[0].scalars for b in batch]))
            for (res, feats, lfeats, timestamp), row in zip(batch, sc):
                n_inl, n_ln_inl, n_matched, nref3, n_pt, n_ln = (
                    int(x) for x in row)
                self._occupancy = (n_pt, n_ln)
                if n_inl < self.cfg.min_track_inliers:
                    self.state = LOST
                    self.stats.append({"inliers": n_inl, "kf": False,
                                       "lost": True})
                    continue
                self.state = OK
                made_kf = False if self.cfg.localization_only else \
                    self._maybe_keyframe(feats, lfeats, res, timestamp,
                                         n_inl, n_matched, nref3)
                self.stats.append({"inliers": n_inl, "kf": made_kf,
                                   "lost": False, "line_inliers": n_ln_inl})

    def _relocalize_frame(self, feats, timestamp):
        # auto-reset instead of relocalizing when lost with a young map
        # (`src/Tracking.cc:563-571`): the few-keyframe map is likely junk
        if self.n_kf_host <= 5 and not self.cfg.localization_only:
            self.reset()
            self.stats.append({"inliers": 0, "kf": False, "lost": True,
                               "auto_reset": True})
            return None
        rok, rT, rn, ranchor = self._relocalize(
            self.ms, feats, key=jax.random.PRNGKey(self.cfg.seed + self.frame_id))
        if bool(rok):
            self.state = OK
            self.velocity = jnp.eye(4)
            self.T_last = rT
            self.last_reloc_frame = self.frame_id
            # seed the local-map window from where the inliers landed
            # (covisibility anchor) — recency alone would immediately lose
            # tracking after a kidnap into an old map region (ADVICE r2)
            self._anchor_kf = int(ranchor)
            ref = self.n_kf_host - 1
            self._log_frame(timestamp,
                            rT @ se3.se3_inv(self.ms.kf_T[max(ref, 0)]), ref)
            self.stats.append({"inliers": int(rn), "kf": False,
                               "lost": False, "reloc": True})
            return np.asarray(rT)
        T = self.velocity @ self.T_last  # dead-reckon (prediction only)
        # LOST frames are exported as a repeat of the last recovered pose,
        # never the dead-reckoned guess (src/System.cc:372)
        self._log_frame(timestamp, None, self.n_kf_host - 1, lost=True)
        self.T_last = T
        self.stats.append({"inliers": 0, "kf": False, "lost": True})
        return np.asarray(T)

    # ------------------------------------------------------------------
    # Asynchronous global BA (reference P3: GBA thread + mbStopGBA abort,
    # `src/LoopClosing.cc:575-645`). One LM round is dispatched per tracked
    # frame; the device queue overlaps it with tracking compute, the host
    # never blocks on it. A new loop closure aborts the in-flight GBA.
    def _start_gba(self, n_rounds: int = 4):
        sel = self._gba_select(self.ms)
        self._gba = {
            "sel": sel,
            "st": self._gba_init(sel.prob),
            # fresh buffer: self.ms is donated to the per-frame tracking
            # program, which would invalidate a held alias
            "kf_T_old": self.ms.kf_T + 0.0,
            "start_kf": self.n_kf_host,
            "round": 0,
            # 1 robust round (3 iters) -> demote -> 3 more rounds ~ the
            # reference's 10-iteration GBA schedule at round granularity
            # (src/Optimizer.cc:41, LoopClosing.cc:651)
            # 4 rounds suffice after a loop closure (the essential graph
            # already moved the map near the optimum); periodic refines
            # start from a drifted state and pass more rounds explicitly
            "n_rounds": n_rounds,
        }

    def _abort_gba(self):
        """`mbStopGBA` equivalent: drop the in-flight optimization."""
        self._gba = None

    def _step_gba(self):
        g = self._gba
        if g is None:
            return
        g["st"] = self._gba_round(g["sel"].prob, g["st"])
        g["round"] += 1
        if g["round"] == 1:
            g["st"] = self._gba_demote(g["sel"].prob, g["st"])
        if g["round"] >= g["n_rounds"]:
            res = self._gba_final(g["sel"].prob, g["st"])
            k_last = self.n_kf_host - 1
            T_ref_before = self.ms.kf_T[k_last] if k_last >= 0 else None
            self.ms = self._gba_merge(self.ms, g["sel"], res, g["kf_T_old"],
                                      jnp.int32(g["start_kf"]))
            if k_last >= 0:
                # re-anchor tracking through the latest keyframe's
                # correction: T_last' = (T_last ∘ T_kf_old^-1) ∘ T_kf_new
                self.T_last = (self.T_last @ se3.se3_inv(T_ref_before)
                               @ self.ms.kf_T[k_last])
            self._gba = None
            self.n_gba_done += 1

    def finish_gba(self):
        """Run any in-flight global BA to completion (used by flush/tests;
        the reference joins its GBA thread in `System::Shutdown`)."""
        while self._gba is not None:
            self._step_gba()

    # ------------------------------------------------------------------
    def _maybe_grow(self):
        """Double-and-pad capacity growth (SURVEY §7 hard part 5). Uses the
        occupancy counters piggybacked on the per-frame readback (no extra
        device sync). Margins cover the worst case one keyframe can append
        (<= 2*n_kp points from two triangulation baselines + depth creation;
        <= 3*n_lf lines from three baselines)."""
        n_pt, n_ln = self._occupancy
        c = self.map_cfg
        new_kf = c.max_kf
        new_pt = c.max_pt
        new_ln = c.max_ln
        if self.n_kf_host >= c.max_kf - 2 and c.max_kf < self.cfg.hard_max_kf:
            new_kf = min(2 * c.max_kf, self.cfg.hard_max_kf)
        if n_pt >= c.max_pt - 3 * c.n_kp and c.max_pt < self.cfg.hard_max_pt:
            new_pt = min(2 * c.max_pt, self.cfg.hard_max_pt)
        if n_ln >= c.max_ln - 4 * c.n_lf and c.max_ln < self.cfg.hard_max_ln:
            new_ln = min(2 * c.max_ln, self.cfg.hard_max_ln)
        if (new_kf, new_pt, new_ln) == (c.max_kf, c.max_pt, c.max_ln):
            return
        self.map_cfg = c._replace(max_kf=new_kf, max_pt=new_pt, max_ln=new_ln)
        self.ms = mstate.grow_jit(self.ms, self.map_cfg)
        self.n_growths += 1
        if new_kf != c.max_kf or new_pt != c.max_pt or new_ln != c.max_ln:
            # the full-map BA budgets follow map capacity, capped: the
            # dense reduced-camera Schur product is O(K^2 P) — beyond ~128
            # cameras the essential graph carries the global correction and
            # BA refines the most recent window (the reference's GBA is also
            # routinely aborted before convergence on large maps)
            self._global_ba = jax.jit(partial(
                mapping.run_local_ba, self.cam, sigma2_levels=self.sigma2,
                window=min(new_kf, 128), p_ba=self._gba_points(),
                l_ba=self._gba_lines(), rank_by_obs=True))
            self._gba_select = jax.jit(partial(
                mapping.ba_select, sigma2_levels=self.sigma2,
                window=min(new_kf, 128), p_ba=self._gba_points(),
                l_ba=self._gba_lines(), rank_by_obs=True))
            if self.loop_closer is not None:
                self.loop_closer._local_ba = self._global_ba
                self.loop_closer.map_cfg = self.map_cfg

    # ------------------------------------------------------------------
    def _maybe_keyframe(self, feats, lfeats, res: tracking.TrackResult,
                        timestamp, n_inl: int, n_matched: int,
                        nref3: int = 0) -> bool:
        """`NeedNewKeyFrame` (`src/Tracking.cc:1568`) policy, single-thread
        form: enough frames elapsed AND tracking weakening vs the reference
        keyframe (or a hard max interval)."""
        since = self.frame_id - self.last_kf_frame
        n_kf = self.n_kf_host
        # no keyframes right after relocalization (src/Tracking.cc:1588):
        # the map statistics collected while lost are unreliable
        if self.frame_id - self.last_reloc_frame < 2 * self.cfg.kf_max_interval:
            return False
        if self.cfg.grow_map:
            self._maybe_grow()
        if n_kf >= self.map_cfg.max_kf - 1:
            return False
        # reference semantics (`NeedNewKeyFrame` c2): tracking is weak when
        # inliers fall below kf_ref_ratio of the reference keyframe's count.
        # Mature maps use the ref KF's >=3-observation landmark count
        # (KeyFrame::TrackedMapPoints(3)); young maps (depth bootstraps
        # create n_obs=1 landmarks, so nref3 ~ 0) compare against the
        # inlier count STORED AT THE LAST KEYFRAME — the decay-by-10% test.
        ref_base = nref3 if nref3 >= 30 else max(self.ref_kf_matches, 15)
        weak = n_inl < self.cfg.kf_ref_ratio * ref_base
        # sensor-aware cadence: depth sensors create landmarks without
        # baseline (dense keyframing helps); monocular triangulation needs
        # baseline (dense keyframing produces shallow-parallax landmarks)
        min_iv = 1 if self._kp_depth is not None else self.cfg.kf_min_interval
        # reference decision = (c1a||c1b||c1c) && c2 — the weakening test
        # c2 gates EVERY path (`src/Tracking.cc:1624-1663`): a saturated
        # map revisiting known views makes NO keyframes no matter how long
        # since the last one. c1a/c1b collapse to the min-interval cadence
        # here (the synchronous mapper is always 'idle'); kf_max_interval
        # acts as c1a's longer horizon for the weak-but-slow-decay case.
        c2 = weak and n_inl > 15
        need = c2 and (since >= min_iv)
        if not need:
            return False

        k_new = n_kf
        # the whole keyframe chain (insert -> triangulate points x2 baselines
        # -> lines x3 baselines -> depth creation -> fuse -> local BA -> cull
        # -> periodic KF cull) as ONE donated program: XLA aliases the
        # intermediates in HBM instead of materializing the full MapState at
        # ~10 program boundaries (mapping.process_keyframe docstring).
        use_depth = getattr(self, "_kp_depth", None) is not None
        kp_depth = self._kp_depth if use_depth else jnp.zeros(
            (self.map_cfg.n_kp,), jnp.float32)
        self.ms = self._process_kf[use_depth](
            self.ms, feats, lfeats, res.T, res.matched_pt, res.matched_ln,
            jnp.int32(self.frame_id), kp_depth,
            do_kf_cull=jnp.bool_(k_new % 4 == 3))
        self.n_kf_host = n_kf + 1
        # the new keyframe is the local-map anchor again (reloc override ends)
        self._anchor_kf = None
        if self.loop_closer is not None:
            # every keyframe (`src/LoopClosing.cc:57` checks each queued KF;
            # the r2 every-2nd-KF skip added up to ~2 KF intervals of
            # correction delay on top of the one-late detection readback)
            self.ms, closed = self.loop_closer.process_keyframe(
                self.ms, k_new, seed=self.cfg.seed)
            if closed:
                # loop correction moved the map: re-anchor tracking and
                # launch the async global BA (aborting any in-flight one —
                # the reference's mbStopGBA, src/LoopClosing.cc:410-423)
                self.T_last = self.ms.kf_T[k_new]
                self.velocity = jnp.eye(4)
                self._abort_gba()
                self._start_gba()
        if (self._gba is None and self.cfg.young_gba_until_kf > 0
                and 2 < k_new + 1 <= self.cfg.young_gba_until_kf):
            # young-map whole-map BA (see SLAMConfig.young_gba_until_kf):
            # synchronous — the map is a few thousand landmarks at most
            # here, and the reference's local BA is effectively global at
            # this age too (all covisible KFs, src/Optimizer.cc:1699)
            self.run_global_ba()
        if (self._gba is None and self.cfg.periodic_gba_every_kf > 0
                and (k_new + 1) % self.cfg.periodic_gba_every_kf == 0
                and k_new + 1 > self.cfg.ba_window):
            # opportunistic background GBA: the reference only runs its GBA
            # thread after a loop closure, so drift between sliding local-BA
            # windows accumulates until a loop fires. Here the device queue
            # is idle during NORMAL tracking (one async LM round is
            # dispatched per tracked frame), so a periodic full-map refine
            # is nearly free and keeps the whole trajectory consistent —
            # a deliberate improvement over `src/LoopClosing.cc:575-645`.
            self._start_gba(n_rounds=10)
        self.last_kf_frame = self.frame_id
        self.ref_kf_matches = n_matched
        self.kf_timestamps.append(timestamp)
        return True

    # ------------------------------------------------------------------
    def shutdown(self):
        """`System::Shutdown` — no threads to join; provided for API parity."""

    def activate_localization_mode(self):
        """`System::ActivateLocalizationMode` (`include/System.h:79`)."""
        self.cfg.localization_only = True

    def deactivate_localization_mode(self):
        self.cfg.localization_only = False

    def n_map_points(self) -> int:
        return int(jnp.sum(self.ms.pt_valid))

    def n_keyframes(self) -> int:
        return int(self.ms.n_kf)

    def flush(self):
        """Resolve any deferred per-frame/per-chunk decisions, drain the
        pending (one-keyframe-late) loop detection, and run any in-flight
        global BA to completion."""
        self._resolve_pending(keep=0)
        self._resolve_chunks(keep=0)
        if self.loop_closer is not None and self.n_kf_host > 0:
            self.ms, closed = self.loop_closer.finish(self.ms,
                                                      seed=self.cfg.seed)
            if closed:
                self.T_last = self.ms.kf_T[self.n_kf_host - 1]
                self.velocity = jnp.eye(4)
                self._abort_gba()
                self._start_gba()
        self.finish_gba()

    @property
    def trajectory(self) -> list:
        """Per-frame (timestamp, Tcw) with poses re-anchored to the CURRENT
        keyframe poses (`SaveTrajectoryTUM` recovery, src/System.cc:363-392).
        Lost frames repeat the last recovered pose (`:372`)."""
        if not self._traj:
            return []
        kf_T = np.asarray(self.ms.kf_T)
        # one batched device fetch for all stored relative poses; chunked
        # entries are ("chunk", stacked_device_array, j) lazy references —
        # fetch each chunk stack once and index on the host
        chunk_cache: dict = {}
        def resolve(r):
            if isinstance(r, tuple) and len(r) == 3 and r[0] == "chunk":
                _, arr, j = r
                key = id(arr)
                if key not in chunk_cache:
                    chunk_cache[key] = np.asarray(arr)
                return chunk_cache[key][j]
            return r
        rels = {}
        dev_entries = []
        for i, e in enumerate(self._traj):
            r = e[1]
            if r is None:
                continue
            if isinstance(r, tuple) and len(r) == 3 and r[0] == "chunk":
                rels[i] = resolve(r)
            elif isinstance(r, np.ndarray):
                rels[i] = r
            else:
                dev_entries.append((i, r))
        if dev_entries:
            stacked = np.asarray(jnp.stack([r for _, r in dev_entries]))
            for j, (i, _) in enumerate(dev_entries):
                rels[i] = stacked[j]
        out = []
        last = np.eye(4, dtype=np.float32)
        for i, (ts, _rel, ref, lost) in enumerate(self._traj):
            if i in rels and not lost:
                last = (rels[i] @ kf_T[min(ref, kf_T.shape[0] - 1)]
                        ).astype(np.float32)
            out.append((ts, last))
        return out

    def _log_frame(self, timestamp, T_rel, ref_kf: int, lost: bool = False):
        self._traj.append((timestamp, T_rel, max(ref_kf, 0), lost))

    def poses(self) -> np.ndarray:
        return np.stack([np.asarray(T) for _, T in self.trajectory])

    # --- trajectory export (src/System.cc:337-519) ---
    def save_trajectory_tum(self, path: str):
        _write_tum(path, self.trajectory)

    def save_keyframe_trajectory_tum(self, path: str):
        n = int(self.ms.n_kf)
        kf = [(self.kf_timestamps[k], np.asarray(self.ms.kf_T[k]))
              for k in range(min(n, len(self.kf_timestamps)))]
        _write_tum(path, kf)

    def run_global_ba(self):
        """Full-map bundle adjustment (`GlobalBundleAdjustemnt`,
        `src/Optimizer.cc:41` — the reference runs it after loop closure;
        exposed publicly for offline mapping refinement)."""
        self.ms = self._global_ba(self.ms)
        if self.n_kf_host > 0:
            self.T_last = self.ms.kf_T[self.n_kf_host - 1]
            self.velocity = jnp.eye(4)

    def save_map(self, path: str):
        """Map checkpoint (the reference's SaveMap TODO, include/System.h:126)."""
        from ..mapstate import checkpoint
        checkpoint.save_map(self.ms, path)

    def load_map(self, path: str):
        from ..mapstate import checkpoint
        self.ms = checkpoint.load_map(path)

    def save_point_cloud(self, path: str):
        """`System::SavePointCloud` (`src/System.cc:521`)."""
        from ..mapstate import checkpoint
        checkpoint.save_point_cloud(self.ms, path)

    def save_trajectory_kitti(self, path: str):
        with open(path, "w") as f:
            for _, T in self.trajectory:
                Twc = np.linalg.inv(T)
                f.write(" ".join(f"{v:.6e}" for v in Twc[:3, :4].reshape(-1)) + "\n")


def _write_tum(path, items):
    from ..geometry import se3 as _se3
    with open(path, "w") as f:
        for ts, T in items:
            Twc = np.linalg.inv(np.asarray(T))
            q = np.asarray(_se3.rot_to_quat(jnp.asarray(Twc[:3, :3])))
            t = Twc[:3, 3]
            # TUM format: tx ty tz qx qy qz qw
            f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")
