"""Functional map state: the whole SLAM map as one pytree of fixed-shape arrays.

TPU-native replacement for the reference's pointer-graph map model
(`src/Map.cc`, `src/KeyFrame.cc`, `src/MapPoint.cc`, `src/MapLine.cpp`):
structure-of-arrays with capacity + validity masks instead of heap objects
and per-object mutexes.  A single host thread owns the authoritative
MapState; device programs are pure functions (state in -> state out), which
deletes the reference's entire lock hierarchy (SURVEY §2.7 P5) by
construction.

Observations are stored per-keyframe as `kf_pt_idx[k, n]` = map-point id
matched to keypoint slot n (−1 = none) — the inverse of the reference's
`MapPoint::mObservations` map. Covisibility (`KeyFrame::UpdateConnections`,
`src/KeyFrame.cc:304-416`) is not stored at all: it is one int matmul over
the observation incidence matrix, computed on demand.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _bow_words():
    from ..vocab import bow as _bow
    return _bow.N_WORDS


class MapConfig(NamedTuple):
    max_kf: int = 48          # keyframe capacity
    max_pt: int = 12288       # map point capacity
    max_ln: int = 1024        # map line capacity
    n_kp: int = 1024          # keypoint slots per frame
    n_lf: int = 256           # line-feature slots per frame
    n_levels: int = 8
    scale: float = 1.2


class MapState(NamedTuple):
    # --- map points ---
    pt_xyz: jnp.ndarray       # (P, 3)
    pt_desc: jnp.ndarray      # (P, 256) u8 — representative descriptor
    pt_normal: jnp.ndarray    # (P, 3) mean viewing direction
    pt_min_dist: jnp.ndarray  # (P,) scale-invariance range
    pt_max_dist: jnp.ndarray  # (P,)
    pt_valid: jnp.ndarray     # (P,) bool
    pt_visible: jnp.ndarray   # (P,) i32 — frustum-visible count (tracking)
    pt_found: jnp.ndarray     # (P,) i32 — actually-matched count
    pt_first_kf: jnp.ndarray  # (P,) i32
    pt_n_obs: jnp.ndarray     # (P,) i32
    # distinctive-descriptor state: bitwise vote accumulator over this
    # point's observed descriptors + sample count. The representative
    # `pt_desc` is the bitwise MAJORITY — the exact minimizer of summed
    # Hamming distance over the observations, the TPU-native form of the
    # reference's min-median-Hamming medoid (`MapPoint::
    # ComputeDistinctiveDescriptors`, `src/MapPoint.cc:249`).
    pt_desc_acc: jnp.ndarray  # (P, 256) u8 saturating bit-vote counts
    pt_desc_cnt: jnp.ndarray  # (P,) i32 samples accumulated (<= 255)
    # --- map lines (two endpoints) ---
    ln_xyz: jnp.ndarray       # (L, 2, 3)
    ln_desc: jnp.ndarray      # (L, 256) u8
    ln_valid: jnp.ndarray     # (L,) bool
    ln_visible: jnp.ndarray   # (L,) i32
    ln_found: jnp.ndarray     # (L,) i32
    ln_first_kf: jnp.ndarray  # (L,) i32
    ln_n_obs: jnp.ndarray     # (L,) i32
    # triangulation-conditioning weight in [0, 1] set at creation:
    # clip(metric / gate, 0, 1) with metric = (baseline/depth)*sin(plane
    # angle) — 1 for every line that passes the conditioning creation gate
    # in mapping.create_new_lines (endpoint depth sigma ~ z/(b sin θ); the
    # gate rejects short-baseline triangulations outright).  Scales each
    # line's information in pose optimization and BA; kept per-line so
    # fuse can upgrade a slot when a wider-baseline re-triangulation
    # merges into it.  Cf the reference's fixed Identity*0.5 line info
    # (`src/Optimizer.cc:1909`).
    ln_cond: jnp.ndarray      # (L,) f32
    # --- keyframes ---
    kf_T: jnp.ndarray         # (K, 4, 4) world -> cam
    kf_valid: jnp.ndarray     # (K,) bool
    kf_frame_id: jnp.ndarray  # (K,) i32
    kf_uv: jnp.ndarray        # (K, N, 2) undistorted keypoints
    kf_octave: jnp.ndarray    # (K, N) i32
    kf_angle: jnp.ndarray     # (K, N) f32
    kf_desc: jnp.ndarray      # (K, N, 256) u8
    kf_kp_valid: jnp.ndarray  # (K, N) bool
    kf_pt_idx: jnp.ndarray    # (K, N) i32 — map point per keypoint (-1)
    # right-image column per keypoint (stereo SAD match or RGBD-synthesized
    # virtual disparity, `Frame::ComputeStereoMatches/FromRGBD`,
    # `src/Frame.cc:977,1154`); <= 0 = monocular observation
    kf_ur: jnp.ndarray        # (K, N) f32
    # --- keyframe line features ---
    kf_ln_uv: jnp.ndarray     # (K, M, 2, 2) endpoint pixels
    kf_ln_l2d: jnp.ndarray    # (K, M, 3) infinite-line equation
    kf_ln_desc: jnp.ndarray   # (K, M, 256) u8
    kf_ln_valid: jnp.ndarray  # (K, M) bool
    kf_ln_idx: jnp.ndarray    # (K, M) i32 — map line per slot (-1)
    kf_bow: jnp.ndarray       # (K, N_WORDS) f32 — place-recognition signature
    # --- counters ---
    n_kf: jnp.ndarray         # () i32
    n_pt: jnp.ndarray         # () i32
    n_ln: jnp.ndarray         # () i32


def allocate(cfg: MapConfig) -> MapState:
    P, L, K, N, M = cfg.max_pt, cfg.max_ln, cfg.max_kf, cfg.n_kp, cfg.n_lf
    f = jnp.zeros
    return MapState(
        pt_xyz=f((P, 3)), pt_desc=f((P, 256), jnp.uint8), pt_normal=f((P, 3)),
        pt_min_dist=f((P,)), pt_max_dist=f((P,)), pt_valid=f((P,), bool),
        pt_visible=f((P,), jnp.int32), pt_found=f((P,), jnp.int32),
        pt_first_kf=f((P,), jnp.int32), pt_n_obs=f((P,), jnp.int32),
        pt_desc_acc=f((P, 256), jnp.uint8), pt_desc_cnt=f((P,), jnp.int32),
        ln_xyz=f((L, 2, 3)), ln_desc=f((L, 256), jnp.uint8),
        ln_valid=f((L,), bool), ln_visible=f((L,), jnp.int32),
        ln_found=f((L,), jnp.int32), ln_first_kf=f((L,), jnp.int32),
        ln_n_obs=f((L,), jnp.int32),
        ln_cond=jnp.ones((L,), jnp.float32),
        kf_T=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
        kf_valid=f((K,), bool), kf_frame_id=f((K,), jnp.int32),
        kf_uv=f((K, N, 2)), kf_octave=f((K, N), jnp.int32),
        kf_angle=f((K, N)), kf_desc=f((K, N, 256), jnp.uint8),
        kf_kp_valid=f((K, N), bool),
        kf_pt_idx=jnp.full((K, N), -1, jnp.int32),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_ln_uv=f((K, M, 2, 2)),
        kf_ln_l2d=jnp.broadcast_to(jnp.asarray([1.0, 0.0, -1e9]), (K, M, 3)),
        kf_ln_desc=f((K, M, 256), jnp.uint8),
        kf_ln_valid=f((K, M), bool),
        kf_ln_idx=jnp.full((K, M), -1, jnp.int32),
        kf_bow=f((K, _bow_words())),
        n_kf=jnp.int32(0), n_pt=jnp.int32(0), n_ln=jnp.int32(0),
    )


def _primary_obs(ms: MapState):
    """(K, N) bool: keypoint n is a valid binding AND the first occurrence
    of its point id in its row — count each shared POINT once, not each
    keypoint (fuse rewiring can bind two keypoints of one keyframe to the
    same landmark; the reference's weights are per-MapPoint,
    `src/KeyFrame.cc:345`)."""
    K, N = ms.kf_pt_idx.shape
    obs = (ms.kf_pt_idx >= 0) & ms.kf_valid[:, None]
    order = jnp.argsort(ms.kf_pt_idx, axis=1)
    srt = jnp.take_along_axis(ms.kf_pt_idx, order, 1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((K, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)],
        axis=1)
    primary = jnp.ones((K, N), bool).at[
        jnp.arange(K)[:, None], order].set(~dup_sorted)
    return obs & primary


def covis_rows(ms: MapState, ks, obs=None):
    """(C, K) covisibility rows: shared-map-point counts between the
    keyframes `ks` (C,) and every keyframe — `KeyFrame::GetCovisibles`
    without materializing anything quadratic in map size.  One (C, P)
    bitmap scatter + one (C, K, N) gather: O(C*K*N) work and memory, vs
    the (K, P) incidence matrix (O(K*P) — ~1 GB at KITTI scale) a full
    matmul needs.  Self-pairs and invalid keyframes read as 0."""
    P = ms.pt_xyz.shape[0]
    K, N = ms.kf_pt_idx.shape
    rows = ms.kf_pt_idx[ks]                                  # (C, N)
    C = rows.shape[0]
    bit = jnp.zeros((C, P), bool).at[
        jnp.arange(C)[:, None], jnp.clip(rows, 0, P - 1)].max(rows >= 0)
    if obs is None:
        obs = _primary_obs(ms)                               # (K, N)
    hit = bit[:, jnp.clip(ms.kf_pt_idx, 0, P - 1)] & obs[None]
    w = jnp.sum(hit.astype(jnp.int32), -1)                   # (C, K)
    w = w.at[jnp.arange(C), jnp.clip(ks, 0, K - 1)].set(0)
    return jnp.where(ms.kf_valid[ks][:, None], w, 0)


def covisibility(ms: MapState, min_weight: int = 0):
    """(K, K) covisibility weights = shared map points per KF pair — the
    reference's `UpdateConnections` (`src/KeyFrame.cc:339-357`; MapLines
    do not contribute — the reference comments that block out).

    Computed as row-chunked :func:`covis_rows` under `lax.map`, so peak
    memory stays O(chunk*K*N) no matter how large the point array grows
    (the former (K, P) incidence matmul was ~1 GB at 1000 KF / 260k pts)."""
    K, N = ms.kf_pt_idx.shape
    chunk = max(1, min(K, (1 << 24) // max(K * N, 1)))
    while K % chunk:
        chunk -= 1
    ks = jnp.arange(K).reshape(K // chunk, chunk)
    obs = _primary_obs(ms)
    W = jax.lax.map(lambda kk: covis_rows(ms, kk, obs), ks).reshape(K, K)
    if min_weight > 0:
        W = jnp.where(W >= min_weight, W, 0)
    return W


def observers_of_points(ms: MapState):
    """(K, P) bool incidence: keyframe k observes point p."""
    P = ms.pt_xyz.shape[0]
    obs = (ms.kf_pt_idx >= 0) & ms.kf_valid[:, None] & ms.kf_kp_valid
    safe_idx = jnp.clip(ms.kf_pt_idx, 0, P - 1)
    inc = jnp.zeros((ms.kf_T.shape[0], P), bool)
    return jax.vmap(lambda row, idx, m: row.at[idx].max(m))(inc, safe_idx, obs)


def grow(ms: MapState, cfg_new: MapConfig) -> MapState:
    """Double-and-pad capacity growth (SURVEY §7 hard part 5): copy the
    current map into freshly-allocated larger-capacity arrays.

    The reference's map grows unboundedly via heap allocation
    (`src/Map.cc`, `src/KeyFrame.cc`); on TPU the static-shape answer is
    chunked growth — each growth event re-pads every array and triggers one
    recompile of the downstream programs (amortized O(log) events over a
    run; the persistent compilation cache makes repeats free).

    Runs as ONE jitted program on device — map arrays never cross the
    host<->device link."""
    new = allocate(cfg_new)

    def copy(dst, src):
        if getattr(src, "ndim", 0) == 0:
            return src
        return dst.at[tuple(slice(0, s) for s in src.shape)].set(src)

    return jax.tree_util.tree_map(copy, new, ms)


# no donation: donated buffers can't alias the larger outputs anyway, and
# the old arrays are freed by refcount right after the copy
grow_jit = jax.jit(grow, static_argnums=(1,))


def append_slots(counter, create_mask, capacity: int):
    """Allocate consecutive slots for masked new items.

    Returns (slot_idx (N,), ok (N,) bool, new_counter). Items beyond
    capacity are dropped (ok=False) — the static-shape answer to dynamic
    map growth (SURVEY §7 hard part 5)."""
    offs = jnp.cumsum(create_mask.astype(jnp.int32)) - 1
    slots = counter + offs
    ok = create_mask & (slots < capacity)
    new_counter = jnp.minimum(counter + jnp.sum(create_mask.astype(jnp.int32)),
                              capacity)
    return jnp.where(ok, slots, capacity - 1), ok, new_counter
