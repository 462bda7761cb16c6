"""Batched multi-stream SLAM: the offline-mapping throughput mode
(BASELINE config 5: 16 parallel streams per chip).

Every per-frame and per-keyframe program in the pipeline is a pure function
of `MapState`, so the multi-stream mode is just `vmap` over a leading stream
axis with the state sharded across a `jax.sharding.Mesh` — the framework's
replacement for a distributed communication backend (SURVEY §2.7 P6): XLA
inserts the collectives, streams ride ICI.

Lockstep semantics: all streams track every frame; keyframe processing runs
on a fixed cadence for ALL streams (offline mapping doesn't need per-stream
adaptive keyframing — the cadence bounds redundancy the same way the
adaptive rule does on average).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import camera as cam_mod
from ..mapstate import state as mstate
from ..models import mapping, tracking
from ..ops import extract
from ..ops import lines as line_ops
from . import streams as streams_mod


class BatchedTracker:
    """Lockstep tracker over S streams, one map per stream."""

    def __init__(self, config, n_streams: int, mesh: Optional[Mesh] = None,
                 use_jit: bool = True, kf_interval: int = 5):
        self.cfg = config
        self.S = n_streams
        self.kf_interval = kf_interval
        self.mesh = mesh
        self.cam = cam_mod.Camera.create(
            config.fx, config.fy, config.cx, config.cy, config.k1, config.k2,
            config.p1, config.p2, config.k3, config.width, config.height)
        self.ext_cfg = extract.ExtractorConfig(
            n_features=config.n_features, n_levels=config.n_levels,
            scale=config.scale_factor, th_fast_high=config.th_fast_high,
            th_fast_low=config.th_fast_low)
        self.map_cfg = mstate.MapConfig(
            max_kf=config.max_kf, max_pt=config.max_pt, max_ln=config.max_ln,
            n_kp=config.n_features, n_lf=config.n_lf,
            n_levels=config.n_levels, scale=config.scale_factor)
        self.scale_factors, self.sigma2 = extract.scale_factors(self.ext_cfg)

        jit = jax.jit if use_jit else (lambda f, **kw: f)

        def one_step(img, ms, T_last, velocity):
            img = img.astype(jnp.float32)
            feats = extract.extract_points(img, self.ext_cfg)
            feats = feats._replace(
                uv_un=cam_mod.undistort_pixels(self.cam, feats.uv))
            lf = line_ops.detect_lines(img, n_out=config.n_lf) \
                if config.use_lines else None
            res, ms = tracking.track_local_map(
                self.cam, ms, feats, T_last,
                scale_factors=self.scale_factors, sigma2_levels=self.sigma2,
                lfeats=lf, n_levels=config.n_levels,
                scale=config.scale_factor,
                line_info=config.track_line_info, velocity=velocity,
                update_stats=True)
            return res, feats, lf, ms

        def make_step(with_kf: bool):
            # The keyframe cadence is a HOST decision shared by all streams
            # (lockstep), so it must be a static branch: a traced `make_kf`
            # under vmap turns `lax.cond` into `select`, which executes the
            # full ~26 ms keyframe chain EVERY step for EVERY stream — the
            # round-1 "16 streams deliver zero scaling" bug.
            def track_and_kf(img, ms, T_last, velocity, frame_id):
                res, feats, lf, ms = one_step(img, ms, T_last, velocity)
                if with_kf:
                    def do_kf(m):
                        return mapping.process_keyframe(
                            self.cam, m, feats, lf, res.T, res.matched_pt,
                            res.matched_ln, frame_id,
                            jnp.zeros((config.n_features,), jnp.float32),
                            sigma2_levels=self.sigma2,
                            scale_factors=self.scale_factors,
                            window=config.ba_window, p_ba=config.ba_points,
                            l_ba=config.ba_lines, max_depth=config.th_depth,
                            do_kf_cull=jnp.bool_(False), use_depth=False)
                    ms = jax.lax.cond(ms.n_kf < self.map_cfg.max_kf - 1,
                                      do_kf, lambda m: m, ms)
                return res.T, res.velocity, res.scalars, ms
            return track_and_kf

        # donate the batched map state + poses: the step updates them
        # in-place in HBM instead of allocating a second full copy
        if use_jit:
            self._step_track = jax.jit(jax.vmap(make_step(False)),
                                       donate_argnums=(1, 2, 3))
            self._step_kf = jax.jit(jax.vmap(make_step(True)),
                                    donate_argnums=(1, 2, 3))
        else:
            self._step_track = jax.vmap(make_step(False))
            self._step_kf = jax.vmap(make_step(True))
        self.reset()

    def reset(self):
        one = mstate.allocate(self.map_cfg)
        self.ms = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.S,) + x.shape).copy(), one)
        self.T_last = jnp.broadcast_to(jnp.eye(4), (self.S, 4, 4))
        self.velocity = jnp.broadcast_to(jnp.eye(4), (self.S, 4, 4))
        self.frame_id = -1
        if self.mesh is not None:
            self.ms = streams_mod.shard_streams(self.mesh, self.ms)
            sh = NamedSharding(self.mesh, P("stream"))
            self.T_last = jax.device_put(self.T_last, sh)
            self.velocity = jax.device_put(self.velocity, sh)

    def bootstrap(self, ms_batch, T_batch=None):
        """Install per-stream initial maps (e.g. from per-stream System init
        or a shared prior map); arrays must carry a leading S axis."""
        self.ms = ms_batch
        if T_batch is not None:
            self.T_last = T_batch

    def step(self, imgs):
        """imgs: (S, H, W) uint8/float. Tracks all streams one frame;
        keyframe-processes on the cadence (a static host decision — see
        make_step). Returns (S, 4, 4) poses."""
        self.frame_id += 1
        step_fn = self._step_kf if self.frame_id % self.kf_interval == 0 \
            else self._step_track
        imgs = jnp.asarray(imgs)
        if self.mesh is not None:
            imgs = jax.device_put(imgs, NamedSharding(self.mesh, P("stream")))
        T, vel, scalars, ms = step_fn(
            imgs, self.ms, self.T_last, self.velocity,
            jnp.full((self.S,), self.frame_id, jnp.int32))
        self.ms = ms
        self.T_last = T
        self.velocity = vel
        return T, scalars


class RoundRobinTracker:
    """Single-chip multi-stream throughput mode: S independent streams
    time-multiplexed through ONE compiled chunked pipeline (shared XLA
    programs — per-stream state is just a pytree swapped per call).

    Rationale: once a single stream's per-frame work saturates the chip
    (the chunked path runs at ~170 fps/chip), lockstep `vmap` batching
    cannot add throughput — the chip has no idle lanes left, and the
    vmapped mega-program pays extra gather/scatter lowering (measured
    ~11 ms/frame-equivalent vs 5.9 ms sequential). Time-slicing streams
    through the single-stream-optimal program IS the chip's capacity.
    `BatchedTracker` remains the multi-chip mode: stream-parallel `vmap`
    over a `jax.sharding.Mesh`, where each device carries its own streams.
    """

    def __init__(self, config, n_streams: int, kf_every_chunks: int = 3):
        from ..models.system import System
        self.S = n_streams
        self.kf_every_chunks = kf_every_chunks
        self.slam = System(config)        # compiled programs + shapes
        self.cfg = config
        self.streams = None
        self.chunk_count = 0

    def bootstrap(self, ms_list, T_list=None):
        """ms_list: S MapStates, or ONE MapState replicated to all streams.
        (MapState is a NamedTuple — i.e. a tuple — so the single-state case
        is detected by its fields, not by isinstance(list/tuple).)"""
        if hasattr(ms_list, "pt_xyz"):
            ms_list = [jax.tree_util.tree_map(lambda x: x.copy(), ms_list)
                       for _ in range(self.S)]
        eye = jnp.eye(4)
        self.streams = [
            {"ms": ms, "T": eye, "vel": eye,
             "frame_id": jnp.int32(0)} for ms in ms_list]

    def step_chunks(self, imgs_per_stream):
        """imgs_per_stream: S arrays of (B, H, W) uint8 (device). Tracks
        each stream through one chunk; runs the keyframe chain for the
        chunk's last frame on the lockstep cadence. Returns the list of
        (B, 4, 4) pose stacks."""
        slam = self.slam
        self.chunk_count += 1
        make_kf = (self.chunk_count % self.kf_every_chunks) == 0
        out = []
        for s, imgs in enumerate(imgs_per_stream):
            st = self.streams[s]
            (ms, T_last, vel), outs = slam._track_chunk(
                st["ms"], imgs, st["T"], st["vel"], jnp.int32(-1))
            Ts, T_rels, scalars, m_pt, m_ln, feats_s, lfeats_s = outs
            B = int(imgs.shape[0])
            st["frame_id"] = st["frame_id"] + B
            if make_kf and int(ms.n_kf) < self.slam.map_cfg.max_kf - 1:
                j = jnp.int32(B - 1)
                f_j, l_j, mp_j, ml_j, T_j = slam._slice_chunk(
                    feats_s, lfeats_s, m_pt, m_ln, Ts, j)
                ms = slam._process_kf[False](
                    ms, f_j, l_j, T_j, mp_j, ml_j,
                    st["frame_id"].astype(jnp.int32),
                    jnp.zeros((self.slam.map_cfg.n_kp,), jnp.float32),
                    do_kf_cull=jnp.bool_(False))
            st["ms"] = ms
            st["T"] = T_last
            st["vel"] = vel
            out.append(Ts)
        return out
