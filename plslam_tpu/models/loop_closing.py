"""Loop closing: detection, Sim3 estimation, loop correction, pose-graph
optimization, global BA — the LoopClosing thread of the reference
(`src/LoopClosing.cc`) as host-orchestrated jitted programs.

Pipeline per keyframe (mirrors `Run` -> `DetectLoop` -> `ComputeSim3` ->
`CorrectLoop`):
1. BoW candidate scoring (dense matmul, `plslam_tpu.vocab.bow`) with the
   covisible-minimum-score and covisibility-exclusion rules
   (`DetectLoop`, `src/LoopClosing.cc:103-229`);
2. temporal consistency across 3 consecutive keyframes
   (`mnCovisibilityConsistencyTh = 3`);
3. matched-landmark Horn Sim3 RANSAC + Sim3 LM refinement
   (`ComputeSim3`, `:231-400`);
4. correction: essential-graph optimization over Sim3 nodes with spanning
   chain + strong-covisibility + loop edges (`OptimizeEssentialGraph`),
   SE3 recovery [R | t/s], landmark re-mapping through each landmark's
   reference keyframe correction (`CorrectLoop`, `:402-585`);
5. global BA over the full keyframe set (`RunGlobalBundleAdjustment`,
   `:645` — synchronous here; the host loop has no competing threads).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3, sim3 as sim3_mod
from ..geometry.sim3 import Sim3
from ..mapstate import state as mstate
from ..ops import hamming
from ..optim import pose_graph, sim3_opt
from ..solvers import horn
from ..vocab import bow

CONSISTENCY_TH = 3  # src/LoopClosing.cc:43


class LoopClosing:
    def __init__(self, cam, map_cfg, sigma2_levels, local_ba_fn, use_jit=True,
                 fix_scale: bool = False):
        self.cam = cam
        self.map_cfg = map_cfg
        self.sigma2 = sigma2_levels
        self.fix_scale = fix_scale
        self._local_ba = local_ba_fn  # full-map BA callable(ms) -> ms
        jit = jax.jit if use_jit else (lambda f, **kw: f)
        self._covis = jit(mstate.covisibility)
        # ONE jitted program for per-keyframe detection inputs (a traced k
        # keeps it a single compile; eager slicing with python ints would
        # compile a new program per keyframe id)
        self._detect_inputs = jit(lambda ms, k: (
            mstate.covisibility(ms),
            bow.l1_score(ms.kf_bow[k], ms.kf_bow)))
        self._match_pairs = jit(self._match_pairs_impl)
        self._sim3_stage = jit(self._sim3_stage_impl)
        self._apply_graph = jit(self._apply_graph_impl)
        # host-side temporal-consistency state
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -10
        self.loop_edges: list[tuple[int, int, np.ndarray]] = []  # (i, j, Sij 7-tuple...)
        self.n_loops = 0

    # ------------------------------------------------------------------
    def _match_pairs_impl(self, ms, k, c):
        """Match keypoints WITH bound map points between KFs k and c.

        Returns per-slot: (idx in c (N,), ok (N,), X1 cam-k (N,3),
        X2 cam-c (N,3), uv1, uv2, s2_1, s2_2) — inputs for Sim3 RANSAC,
        cf `ORBmatcher::SearchByBoW(KF,KF)` (`src/ORBmatcher.cc:574`)."""
        P = ms.pt_xyz.shape[0]
        N = ms.kf_uv.shape[1]
        bound1 = ms.kf_pt_idx[k] >= 0
        bound2 = ms.kf_pt_idx[c] >= 0
        D = hamming.distance_matrix(ms.kf_desc[k], ms.kf_desc[c])
        mask = bound1[:, None] & bound2[None, :]
        idx, best, second = hamming.masked_best2(D, mask)
        ok = (best <= 50) & (best.astype(jnp.float32)
                             < 0.75 * second.astype(jnp.float32))
        Dm = jnp.where(mask, D, hamming.INVALID)
        rev = jnp.argmin(Dm, axis=0)
        ok = ok & (rev[idx] == jnp.arange(N))

        p1 = jnp.clip(ms.kf_pt_idx[k], 0, P - 1)
        p2 = jnp.clip(ms.kf_pt_idx[c][idx], 0, P - 1)
        X1 = se3.transform(ms.kf_T[k], ms.pt_xyz[p1])
        X2 = se3.transform(ms.kf_T[c], ms.pt_xyz[p2])
        uv1 = ms.kf_uv[k]
        uv2 = ms.kf_uv[c][idx]
        s2_1 = self.sigma2[ms.kf_octave[k]]
        s2_2 = self.sigma2[ms.kf_octave[c][idx]]
        return idx, ok, X1, X2, uv1, uv2, s2_1, s2_2

    def _sim3_stage_impl(self, ms, k, c, key):
        idx, ok, X1, X2, uv1, uv2, s2_1, s2_2 = self._match_pairs_impl(ms, k, c)
        n_matches = jnp.sum(ok.astype(jnp.int32))
        rr = horn.ransac_sim3(key, X1, X2, uv1, uv2, ok, self.cam,
                              s2_1, s2_2, fix_scale=self.fix_scale)
        res = sim3_opt.optimize_sim3(self.cam, rr.S12, X1, X2, uv1, uv2,
                                     ok & rr.inliers, s2_1, s2_2,
                                     fix_scale=self.fix_scale)
        return n_matches, rr.ok, res.S12, res.n_inliers

    # ------------------------------------------------------------------
    def _apply_graph_impl(self, ms, nodes_s, nodes_R, nodes_t,
                          edge_i, edge_j, em_s, em_R, em_t, edge_mask,
                          edge_w, fixed_mask):
        """Run the essential-graph optimization and write corrected poses +
        landmarks back into the map state."""
        K = ms.kf_T.shape[0]
        nodes = Sim3(nodes_s, nodes_R, nodes_t)
        edges = pose_graph.PoseGraphEdges(
            edge_i, edge_j, Sim3(em_s, em_R, em_t), edge_mask, edge_w)
        opt = pose_graph.optimize_essential_graph(
            nodes, ms.kf_valid, fixed_mask, edges, fix_scale=self.fix_scale)

        # SE3 recovery [R | t/s] (src/Optimizer.cc:2324-2335)
        new_T = sim3_mod.to_se3(opt)
        new_T = jnp.where(ms.kf_valid[:, None, None], new_T, ms.kf_T)

        # landmark correction through each landmark's reference keyframe:
        # X' = S_new_ref^{-1}( S_old_ref( X ) )
        P = ms.pt_xyz.shape[0]
        ref = jnp.clip(ms.pt_first_kf, 0, K - 1)
        S_old = Sim3(nodes_s[ref], nodes_R[ref], nodes_t[ref])
        S_new_inv = sim3_mod.inverse(Sim3(opt.s[ref], opt.R[ref], opt.t[ref]))
        Xc = sim3_mod.apply(S_old, ms.pt_xyz)
        Xw = sim3_mod.apply(S_new_inv, Xc)
        pt_xyz = jnp.where(ms.pt_valid[:, None], Xw, ms.pt_xyz)

        Lref = jnp.clip(ms.ln_first_kf, 0, K - 1)
        S_old_l = Sim3(nodes_s[Lref], nodes_R[Lref], nodes_t[Lref])
        S_new_l = sim3_mod.inverse(Sim3(opt.s[Lref], opt.R[Lref], opt.t[Lref]))
        def corr_ln(e):
            return sim3_mod.apply(S_new_l, sim3_mod.apply(S_old_l, e))
        ln_xyz = jnp.stack([corr_ln(ms.ln_xyz[:, 0]), corr_ln(ms.ln_xyz[:, 1])], 1)
        ln_xyz = jnp.where(ms.ln_valid[:, None, None], ln_xyz, ms.ln_xyz)

        return ms._replace(kf_T=new_T, pt_xyz=pt_xyz, ln_xyz=ln_xyz)

    # ------------------------------------------------------------------
    def detect(self, ms, k: int) -> list[int]:
        """BoW candidates with min-covisible-score + consistency grouping."""
        if k - self.last_loop_kf < 10:  # src/LoopClosing.cc:114
            return []
        W, scores = self._detect_inputs(ms, jnp.int32(k))
        W = np.asarray(W)
        scores = np.asarray(scores)
        covis = set(np.nonzero(W[k] >= 15)[0].tolist())
        n_kf = k + 1
        if covis:
            min_score = min(scores[j] for j in covis if j < n_kf)
        else:
            min_score = 0.05
        exclude = covis | {k} | set(range(n_kf, ms.kf_valid.shape[0]))
        # temporal neighbors are trivially similar — exclude the recent past
        exclude |= set(range(max(0, k - 5), k))
        cands = [j for j in range(n_kf)
                 if j not in exclude and scores[j] >= max(min_score, 0.015)]
        cands.sort(key=lambda j: -scores[j])
        cands = cands[:8]

        # consistency across CONSISTENCY_TH consecutive keyframes
        new_groups = []
        consistent_enough = []
        for j in cands:
            group = set(np.nonzero(W[j] > 0)[0].tolist()) | {j}
            count = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count + 1 >= CONSISTENCY_TH:
                consistent_enough.append(j)
        self.consistent_groups = new_groups
        return consistent_enough

    # ------------------------------------------------------------------
    def process_keyframe(self, ms, k: int, seed: int = 0):
        """Full loop-closing attempt for keyframe k. Returns (ms, closed)."""
        candidates = self.detect(ms, k)
        for c in candidates:
            n_matches, ransac_ok, S12, n_inl = self._sim3_stage(
                ms, jnp.int32(k), jnp.int32(c),
                jax.random.PRNGKey(seed + self.n_loops))
            if not bool(ransac_ok) or int(n_inl) < 20:  # src/LoopClosing.cc:329
                continue
            ms = self.correct(ms, k, c, S12)
            self.last_loop_kf = k
            self.n_loops += 1
            return ms, True
        return ms, False

    # ------------------------------------------------------------------
    def correct(self, ms, k: int, c: int, S_kc: Sim3):
        """Essential-graph correction + global BA."""
        K = ms.kf_T.shape[0]
        n_kf = int(ms.n_kf)
        kf_T = np.asarray(ms.kf_T)

        # nodes: current poses as Sim3 (scale 1)
        nodes = sim3_mod.from_se3(jnp.asarray(kf_T))

        # edges: spanning chain + strong covisibility + loop edge(s)
        W = np.asarray(self._covis(ms))
        ei, ej, ems, emR, emt, ew = [], [], [], [], [], []

        def rel_sim3(i, j):  # S_ij = S_i ∘ S_j^-1 from current poses
            Si = sim3_mod.from_se3(jnp.asarray(kf_T[i]))
            Sj = sim3_mod.from_se3(jnp.asarray(kf_T[j]))
            return sim3_mod.compose(Si, sim3_mod.inverse(Sj))

        def add_edge(i, j, S, w):
            ei.append(i)
            ej.append(j)
            ems.append(float(S.s))
            emR.append(np.asarray(S.R))
            emt.append(np.asarray(S.t))
            ew.append(w)

        for i in range(1, n_kf):
            add_edge(i, i - 1, rel_sim3(i, i - 1), 1.0)  # spanning chain
        for i in range(n_kf):
            for j in range(i + 2, n_kf):
                if W[i, j] >= 100:  # src/Optimizer.cc:2127
                    add_edge(i, j, rel_sim3(i, j), 1.0)
        for (i, j, S7) in self.loop_edges:  # previous loops
            add_edge(i, j, sim3_mod.expmap(jnp.asarray(S7)), 2.0)
        # the new loop edge: S_kc maps c-frame coords to k-frame coords, so
        # S_k ∘ S_c^{-1} (the edge measurement convention) equals S_kc
        add_edge(k, c, S_kc, 2.0)
        self.loop_edges.append(
            (k, c, np.asarray(sim3_mod.logmap(S_kc))))

        E_cap = max(16, len(ei))
        pad = E_cap - len(ei)
        edge_i = jnp.asarray(np.array(ei + [0] * pad, np.int32))
        edge_j = jnp.asarray(np.array(ej + [0] * pad, np.int32))
        em_s = jnp.asarray(np.array(ems + [1.0] * pad, np.float32))
        em_R = jnp.asarray(np.stack(emR + [np.eye(3)] * pad).astype(np.float32))
        em_t = jnp.asarray(np.stack(emt + [np.zeros(3)] * pad).astype(np.float32))
        edge_mask = jnp.asarray(np.array([True] * len(ei) + [False] * pad))
        edge_w = jnp.asarray(np.array(ew + [0.0] * pad, np.float32))

        fixed = np.zeros(K, bool)
        fixed[c] = True  # reference fixes the loop keyframe (src/Optimizer.cc:2220)
        ms = self._apply_graph(ms, nodes.s, nodes.R, nodes.t,
                               edge_i, edge_j, em_s, em_R, em_t,
                               edge_mask, edge_w, jnp.asarray(fixed))
        # global BA (synchronous RunGlobalBundleAdjustment equivalent)
        ms = self._local_ba(ms)
        return ms
