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
                 fix_scale: bool = False, max_drift_rot: float = 0.8):
        self.cam = cam
        self.max_drift_rot = max_drift_rot  # rad; drift-plausibility gate
        # on accepted Sim3 (see _try_close)
        self.map_cfg = map_cfg
        self.sigma2 = sigma2_levels
        self.fix_scale = fix_scale
        self._local_ba = local_ba_fn  # full-map BA callable(ms) -> ms
        jit = jax.jit if use_jit else (lambda f, **kw: f)
        self._covis = jit(mstate.covisibility)
        # Candidate selection runs ON DEVICE; the readback is 8 candidate
        # ids + scores + their (8, K) group-membership rows — NOT the full
        # (K, K) covisibility matrix (which grows quadratically with map
        # size while the relay link is the bottleneck). A traced k keeps it
        # one compile across keyframes.
        self._detect_inputs = jit(self._detect_inputs_impl)
        self._match_pairs = jit(self._match_pairs_impl)
        self._sim3_stage = jit(self._sim3_stage_impl)
        self._apply_graph = jit(self._apply_graph_impl)
        # batched relative-Sim3 edge measurements: S_i ∘ S_j^{-1} for all
        # edges in ONE program (host loops over edges would cost several
        # device dispatches per edge at K=hundreds)
        self._rel_edges = jit(lambda kf_T, ei, ej: sim3_mod.compose(
            sim3_mod.from_se3(kf_T[ei]),
            sim3_mod.inverse(sim3_mod.from_se3(kf_T[ej]))))
        self._search_fuse = jit(self._search_fuse_impl)
        # host-side temporal-consistency state
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -10
        self.loop_edges: list[tuple[int, int, np.ndarray]] = []  # (i, j, Sij 7-tuple...)
        self.n_loops = 0
        # keyframe poses snapshotted immediately before the last accepted
        # correction — lets tests compare pre- vs post-closure accuracy
        self.pre_correction_kf_T: Optional[np.ndarray] = None
        self.post_correction_kf_T: Optional[np.ndarray] = None
        self.last_closure: Optional[tuple[int, int]] = None

    # ------------------------------------------------------------------
    def _detect_inputs_impl(self, ms, k, n_cand: int = 8, n_pre: int = 16):
        """Device-side loop-candidate selection (`DetectLoop` +
        `KeyFrameDatabase::DetectLoopCandidates`, `src/LoopClosing.cc:103`,
        `src/KeyFrameDatabase.cc:76-197`): BoW L1 scores gated by the
        minimum score among covisible keyframes, the shared-word prefilter
        (> 0.8 x max common words), covisibility-GROUP accumulated scoring
        with the 0.75 x best-group keep rule, excluding the covisible set
        and the recent past; returns the top candidates + their
        covisibility-group rows for host-side temporal-consistency
        bookkeeping.

        Scale discipline: this runs on EVERY keyframe, so it never builds
        the (K, K) covisibility matrix (let alone the (K, P) incidence —
        ~1 GB at KITTI scale).  It needs exactly n_pre+1 covisibility ROWS
        (`mstate.covis_rows`, O(K*N) each): the query's row for the
        min-score/exclusion gates, and the rows of the top-`n_pre`
        individually-scored candidates for group accumulation.  The
        reference accumulates groups over every word-sharing keyframe; the
        top-16 pre-cut only drops candidates that could not have won the
        0.75 x best-group contest unless their ENTIRE group consisted of
        sub-top-16 scores — negligible at 8 final candidates."""
        K = ms.kf_valid.shape[0]
        scores = bow.l1_score(ms.kf_bow[k], ms.kf_bow)
        ids = jnp.arange(K)
        valid = ms.kf_valid & (ids < ms.n_kf)
        wk = mstate.covis_rows(ms, k[None] if jnp.ndim(k) == 0
                               else jnp.asarray([k]))[0]      # (K,)
        covis = (wk >= 15) & valid
        min_score = jnp.min(jnp.where(covis, scores, jnp.inf))
        min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.05)
        exclude = covis | ~valid | ((ids >= k - 5) & (ids <= k))
        th = jnp.maximum(min_score, 0.015)
        # shared-word prefilter (`src/KeyFrameDatabase.cc:96-143`): count
        # common BoW words with the query; only keyframes above 0.8 x the
        # max common-word count stay in contention
        qw = ms.kf_bow[k] > 0
        cw = jnp.sum((qw[None, :] & (ms.kf_bow > 0)).astype(jnp.int32),
                     axis=-1)
        cw = jnp.where(~exclude, cw, 0)
        share08 = ~exclude & (cw.astype(jnp.float32)
                              > 0.8 * jnp.max(cw).astype(jnp.float32))
        eligible = share08 & (scores >= th)
        # covisibility-group accumulated score (`:149-197`): each
        # candidate's score plus the scores of its top-10 covisible
        # neighbors that also pass the shared-word filter; groups below
        # 0.75 x the best accumulated score are dropped
        n_pre = min(n_pre, K)
        pre_sc, pre_id = jax.lax.top_k(
            jnp.where(eligible, scores, -1.0), n_pre)        # (n_pre,)
        pre_rows = mstate.covis_rows(ms, pre_id)             # (n_pre, K)
        nb_w, nb_i = jax.lax.top_k(pre_rows, min(10, K))     # (n_pre, 10)
        nb_contrib = (nb_w > 0) & share08[nb_i]
        acc = scores[pre_id] + jnp.sum(
            jnp.where(nb_contrib, scores[nb_i], 0.0), axis=-1)
        pre_ok = pre_sc > 0
        best_acc = jnp.max(jnp.where(pre_ok, acc, -jnp.inf))
        keep = pre_ok & (acc >= 0.75 * best_acc)
        cand_score = jnp.where(keep, acc, -1.0)              # (n_pre,)
        top_sc, top_j = jax.lax.top_k(cand_score, min(n_cand, n_pre))
        top_id = pre_id[top_j]
        group_rows = ((pre_rows[top_j] > 0)
                      | (ids[None, :] == top_id[:, None]))
        return top_id, top_sc, group_rows

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

    def _sim3_stage_impl(self, ms, k, c, group, key):
        idx, ok, X1, X2, uv1, uv2, s2_1, s2_2 = self._match_pairs_impl(ms, k, c)
        n_matches = jnp.sum(ok.astype(jnp.int32))
        rr = horn.ransac_sim3(key, X1, X2, uv1, uv2, ok, self.cam,
                              s2_1, s2_2, fix_scale=self.fix_scale)
        res = sim3_opt.optimize_sim3(self.cam, rr.S12, X1, X2, uv1, uv2,
                                     ok & rr.inliers, s2_1, s2_2,
                                     fix_scale=self.fix_scale)

        # SearchBySim3 (`ORBmatcher::SearchBySim3`, `src/ORBmatcher.cc:1199`;
        # called at `src/LoopClosing.cc:310`): use the refined S12 to GUIDE a
        # second, wider matching pass between the two keyframes' landmarks,
        # then re-refine on the enlarged set. A loop edge fit on ~20 RANSAC
        # inliers is too coarse to correct a whole-map drift; the reference
        # demands >= 40 matches after this pass (`:375-385`).
        N = ms.kf_uv.shape[1]
        P = ms.pt_xyz.shape[0]
        bound1 = ms.kf_pt_idx[k] >= 0
        bound2 = ms.kf_pt_idx[c] >= 0
        p2 = jnp.clip(ms.kf_pt_idx[c], 0, P - 1)
        X2_all = se3.transform(ms.kf_T[c], ms.pt_xyz[p2])       # cam-c
        X2in1 = res.S12.s * X2_all @ res.S12.R.T + res.S12.t    # cam-k
        z = jnp.maximum(X2in1[:, 2], 1e-6)
        proj = jnp.stack([self.cam.fx * X2in1[:, 0] / z + self.cam.cx,
                          self.cam.fy * X2in1[:, 1] / z + self.cam.cy], -1)
        d_px = jnp.linalg.norm(ms.kf_uv[k][:, None, :] - proj[None, :, :],
                               axis=-1)                          # (N, N)
        D = hamming.distance_matrix(ms.kf_desc[k], ms.kf_desc[c])
        radius = 7.5 * jnp.power(1.2, ms.kf_octave[c].astype(jnp.float32))
        gmask = (bound1[:, None] & bound2[None, :] & (X2in1[:, 2] > 0)[None, :]
                 & (d_px < radius[None, :]))
        gidx, gbest, _ = hamming.masked_best2(D, gmask)
        g_ok = gbest <= 100  # TH_HIGH (src/ORBmatcher.cc:1283)
        # mutual best to dedup
        Dm = jnp.where(gmask, D, hamming.INVALID)
        rev = jnp.argmin(Dm, axis=0)
        g_ok = g_ok & (rev[gidx] == jnp.arange(N))

        # union with the BoW matches, re-gather pair data for the new idx
        use_g = g_ok & ~ok
        idx2 = jnp.where(use_g, gidx, idx)
        ok2 = ok | use_g
        p2g = jnp.clip(ms.kf_pt_idx[c][idx2], 0, P - 1)
        X2u = se3.transform(ms.kf_T[c], ms.pt_xyz[p2g])
        uv2u = ms.kf_uv[c][idx2]
        s2_2u = self.sigma2[ms.kf_octave[c][idx2]]
        res2 = sim3_opt.optimize_sim3(self.cam, res.S12, X1, X2u, uv1, uv2u,
                                      ok2, s2_1, s2_2u,
                                      fix_scale=self.fix_scale)

        # Final acceptance count: project the whole LOOP GROUP's landmarks
        # (candidate + its covisible keyframes — the group row computed at
        # detection) into keyframe k through the refined S12 and count
        # matched keypoints (`SearchByProjection(pKF, Scw, vpLoopPoints,..,
        # 10)`, `src/LoopClosing.cc:375-385`; matcher `src/ORBmatcher.cc:
        # 329`). The union with the pairwise matches is what the >= 40
        # gate sees — candidate-only landmarks undercount exactly when
        # drift is large and the loop is most needed.
        grp_rows = jnp.where(group[:, None], ms.kf_pt_idx, -1)
        grp_pts = jnp.zeros((P,), bool).at[
            jnp.clip(grp_rows, 0, P - 1).reshape(-1)].max(
            (grp_rows >= 0).reshape(-1)) & ms.pt_valid
        # world -> cam-c -> (S12) -> cam-k
        Xw_c = se3.transform(ms.kf_T[c], ms.pt_xyz)             # (P,3) cam-c
        Xg = res2.S12.s * Xw_c @ res2.S12.R.T + res2.S12.t      # (P,3) cam-k
        zg = jnp.maximum(Xg[:, 2], 1e-6)
        pg = jnp.stack([self.cam.fx * Xg[:, 0] / zg + self.cam.cx,
                        self.cam.fy * Xg[:, 1] / zg + self.cam.cy], -1)
        d_g = jnp.linalg.norm(ms.kf_uv[k][:, None, :] - pg[None, :, :],
                              axis=-1)                           # (N, P)
        Dg = hamming.distance_matrix(ms.kf_desc[k], ms.pt_desc)  # (N, P)
        rad_k = 10.0 * jnp.power(1.2, ms.kf_octave[k].astype(jnp.float32))
        pmask = (grp_pts[None, :] & (Xg[:, 2] > 0)[None, :]
                 & (d_g < rad_k[:, None]))
        _, pbest, _ = hamming.masked_best2(Dg, pmask)
        p_ok = pbest <= 50                                       # TH_LOW
        n_total = jnp.sum((ok2 | p_ok).astype(jnp.int32))
        return n_total, rr.n_inliers, res2.S12, res2.n_inliers

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
    def detect(self, ms, k: int) -> list:
        """BoW candidates with min-covisible-score + consistency grouping,
        ONE KEYFRAME LATE: the device-side selection for keyframe k is
        dispatched now with an async host copy, and the PREVIOUS
        keyframe's selection (whose transfer has already landed) is
        resolved — the detection readback never blocks the keyframe chain.
        The reference's LoopClosing thread consumes its keyframe queue
        with the same lag (`src/LoopClosing.cc:57-95`).

        Returns [(kf_id, candidate_id, group_row), ...] — kf_id is the
        PREVIOUS keyframe the candidates belong to."""
        if k - self.last_loop_kf < 10:  # src/LoopClosing.cc:114
            # a fresh closure warped the map: any pending selection is
            # stale, and consistency restarts (reference resets mvp groups)
            self._pending_detect = None
            return []
        pending = getattr(self, "_pending_detect", None)
        tid, tsc, rows = self._detect_inputs(ms, jnp.int32(k))
        for a in (tid, tsc, rows):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        self._pending_detect = (k, tid, tsc, rows)
        return self._consistency(pending)

    def _consistency(self, pending):
        """Resolve one dispatched selection (readback + the 3-consecutive
        consistency grouping). Returns [(kf_id, cand_id, group_row), ...]"""
        if pending is None:
            return []
        pk, tid, tsc, rows = pending
        top_id = np.asarray(tid)
        top_sc = np.asarray(tsc)
        group_rows = np.asarray(rows)
        cands = [(int(j), group_rows[i])
                 for i, j in enumerate(top_id) if top_sc[i] > 0]

        new_groups = []
        consistent_enough = []
        for j, row in cands:
            group = set(np.nonzero(row)[0].tolist()) | {j}
            count = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count + 1 >= CONSISTENCY_TH:
                consistent_enough.append((pk, j, row))
        self.consistent_groups = new_groups
        return consistent_enough

    def finish(self, ms, seed: int = 0):
        """Drain the pending one-late detection (flush/shutdown — the
        reference joins its LoopClosing thread the same way). Returns
        (ms, closed)."""
        pending = getattr(self, "_pending_detect", None)
        self._pending_detect = None
        if pending is None:
            return ms, False
        return self._try_close(ms, pending[0], self._consistency(pending),
                               seed)

    # ------------------------------------------------------------------
    def _search_fuse_impl(self, ms, k, c):
        """`SearchAndFuse` (`src/LoopClosing.cc:587`) after loop correction:
        project the loop side's map points into the current side's recent
        keyframes (whose poses were just corrected) and bind them to
        matching unbound keypoints — densifying cross-loop observations so
        the subsequent GBA stitches both sides together."""
        from ..models import mapping as mapping_mod
        P = ms.pt_xyz.shape[0]
        K = ms.kf_T.shape[0]
        # loop-side points: observed by the matched keyframe c (the
        # reference uses c's covisibility group's points; c's own
        # observations are the dominant subset)
        cand = jnp.zeros((P,), bool).at[
            jnp.clip(ms.kf_pt_idx[c], 0, P - 1)].max(ms.kf_pt_idx[c] >= 0)
        cand = cand & ms.pt_valid
        # fuse WITH REPLACE into the current keyframe and its 3
        # predecessors (the corrected covisibility group); radius 4
        # (src/LoopClosing.cc:599). Replace semantics — duplicates created
        # at the revisit are merged into the loop-side originals — are what
        # couple the loop's two sides for the subsequent global BA.
        for back in range(4):
            ms = mapping_mod.loop_fuse(
                self.cam, ms, jnp.clip(k - back, 0, K - 1), cand, radius=4.0)
        # replace-rewiring can leave a keyframe observing the kept landmark
        # through two keypoint rows; erase the worse-pixel duplicates
        ms = mapping_mod.dedup_kf_point_rows(self.cam, ms)
        return ms

    # ------------------------------------------------------------------
    def process_keyframe(self, ms, k: int, seed: int = 0):
        """Full loop-closing attempt for keyframe k. Returns (ms, closed).
        On closure the essential-graph correction + SearchAndFuse have run;
        the caller is responsible for scheduling the (asynchronous) global
        BA (`RunGlobalBundleAdjustment`, `src/LoopClosing.cc:645`)."""
        candidates = self.detect(ms, k)
        return self._try_close(ms, k, candidates, seed)

    def _try_close(self, ms, k: int, candidates, seed: int = 0):
        K_now = ms.kf_valid.shape[0]
        for pk, c, group_row in candidates:
            # detection resolves one keyframe late; pad its group row if
            # the map grew in between
            if len(group_row) < K_now:
                group_row = np.pad(group_row,
                                   (0, K_now - len(group_row)))
            n_matches, n_seed, S12, n_inl = self._sim3_stage(
                ms, jnp.int32(pk), jnp.int32(c), jnp.asarray(group_row),
                jax.random.PRNGKey(seed + self.n_loops))
            # Acceptance: >= 20 Sim3-opt inliers (src/LoopClosing.cc:329)
            # AND >= 40 total matches after the guided SearchBySim3 pass
            # (:375-385), with a seed-sanity floor on the RANSAC consensus.
            # The reference additionally demands a STRICT > 20 RANSAC
            # consensus before refinement (`Sim3Solver::iterate`,
            # src/Sim3Solver.cc:192) — but it buys that with sequential
            # retry: up to 300 iterations per candidate, and the candidate
            # set is re-drawn at every subsequent keyframe. Our RANSAC is
            # one vmapped shot; at the low inlier ratios of long-range
            # loops (~20/90 on the box-circuit fixture) a 3-point Horn fit
            # rarely captures the full consensus even when the geometry is
            # right, while the LM refinement (chi2 re-selection in both
            # images) recovers it. So the hard >= 20 and >= 40 counts are
            # enforced AFTER refinement — same counts, stronger estimator —
            # and RANSAC only needs a 12-inlier seed (wrong candidate pairs
            # measured n_inl 0/0/0/14 vs 21 for the true pair).
            if int(n_seed) < 12 or int(n_inl) < 20 or int(n_matches) < 40:
                continue
            # Drift-plausibility gate (round 5): a TRUE closure's Sim3
            # differs from the map's own relative-pose estimate by the
            # accumulated drift (small rotation); a perceptually-aliased
            # match between REPEATED structure (the tiled-photo room: one
            # wall matched onto a perpendicular wall, all descriptor and
            # Sim3-consistency gates genuinely satisfied) implies a
            # ~90-180 deg discrepancy and would rotate the whole
            # trajectory through the essential graph (measured: kf ATE
            # 0.010 -> 0.698 on a false (20,4) closure,
            # scripts/default_loop_fixture_probe.py --photo). The
            # reference has no such gate — perceptual aliasing is the
            # classic place-recognition failure it simply never meets on
            # its evaluation data.
            R_map = np.asarray(ms.kf_T[pk][:3, :3] @ ms.kf_T[c][:3, :3].T)
            R_err = R_map @ np.asarray(S12.R).T
            ang = float(np.arccos(np.clip((np.trace(R_err) - 1.0) / 2.0,
                                          -1.0, 1.0)))
            if ang > self.max_drift_rot:
                continue
            self.pre_correction_kf_T = np.array(ms.kf_T)
            self.last_closure = (pk, c)
            ms = self.correct(ms, pk, c, S12)
            # snapshot right after the essential-graph correction: tests
            # compare pre vs post to prove the correction itself helps
            # (the follow-up GBA optimizes reprojection under the GIVEN
            # intrinsics, so GT improvement is only guaranteed up to the
            # calibration quality)
            self.post_correction_kf_T = np.array(ms.kf_T)
            ms = self._search_fuse(ms, jnp.int32(k), jnp.int32(c))
            self.last_loop_kf = k
            self.n_loops += 1
            return ms, True
        return ms, False

    # ------------------------------------------------------------------
    def correct(self, ms, k: int, c: int, S_kc: Sim3):
        """Essential-graph correction (`CorrectLoop`, `src/LoopClosing.cc:
        402-585`). Edge index lists are built on the host (ints only); ALL
        relative-Sim3 measurements are computed in one batched device
        program. The follow-up global BA is the caller's responsibility
        (asynchronous, like the reference's GBA thread)."""
        K = ms.kf_T.shape[0]
        n_kf = int(ms.n_kf)

        # nodes: current poses as Sim3 (scale 1)
        nodes = sim3_mod.from_se3(ms.kf_T)

        # edge indices: spanning tree + strong covisibility + loop edge(s).
        # Covisibility needs one (K,K) readback — only on actual loop
        # closures (rare), not per keyframe.
        W = np.asarray(self._covis(ms))
        # spanning tree: parent = the earlier keyframe with max shared
        # observations (`KeyFrame::UpdateConnections` first-connection rule,
        # src/KeyFrame.cc:408-413), falling back to the temporal predecessor
        # when a culled/disjoint keyframe shares nothing.  Vectorized —
        # the former per-keyframe Python loop was O(K^2) host work per
        # closure, a real wall at KITTI scale (VERDICT r2 #3).
        low = np.tril(W[:n_kf, :n_kf], -1)
        par = low.argmax(axis=1)
        par = np.where(low[np.arange(n_kf), par] < 15,
                       np.arange(n_kf) - 1, par)
        ei = list(range(1, n_kf))
        ej = [int(p) for p in par[1:]]
        ew = [1.0] * (n_kf - 1)
        iu, ju = np.nonzero(np.triu(W[:n_kf, :n_kf] >= 100, 2))
        ei += iu.tolist()
        ej += ju.tolist()                          # src/Optimizer.cc:2127
        ew += [1.0] * len(iu)
        n_rel = len(ei)                            # measured from current poses

        for (i, j, _S7) in self.loop_edges:        # previous loops
            ei.append(i); ej.append(j); ew.append(2.0)
        ei.append(k); ej.append(c); ew.append(2.0)  # the new loop edge

        E = len(ei)
        E_cap = max(16, 1 << (E - 1).bit_length())  # pad: bounded recompiles
        pad = E_cap - E
        edge_i = jnp.asarray(np.array(ei + [0] * pad, np.int32))
        edge_j = jnp.asarray(np.array(ej + [0] * pad, np.int32))
        edge_mask = jnp.asarray(np.array([True] * E + [False] * pad))
        edge_w = jnp.asarray(np.array(ew + [0.0] * pad, np.float32))

        # relative measurements: current poses for chain/covis edges, the
        # stored Sim3 for loop edges (previous ones + the new S_kc: S_kc
        # maps c-frame coords to k-frame coords = S_k ∘ S_c^{-1} convention)
        rel = self._rel_edges(ms.kf_T, edge_i, edge_j)
        em_s = np.array(rel.s)    # writable copies (np.asarray of a jax
        em_R = np.array(rel.R)    # array is a read-only view)
        em_t = np.array(rel.t)
        for off, (i, j, S7) in enumerate(self.loop_edges):
            S = sim3_mod.expmap(jnp.asarray(S7))
            em_s[n_rel + off] = float(S.s)
            em_R[n_rel + off] = np.asarray(S.R)
            em_t[n_rel + off] = np.asarray(S.t)
        em_s[E - 1] = float(S_kc.s)
        em_R[E - 1] = np.asarray(S_kc.R)
        em_t[E - 1] = np.asarray(S_kc.t)
        self.loop_edges.append((k, c, np.asarray(sim3_mod.logmap(S_kc))))

        fixed = np.zeros(K, bool)
        fixed[c] = True  # reference fixes the loop keyframe (src/Optimizer.cc:2220)
        return self._apply_graph(ms, nodes.s, nodes.R, nodes.t,
                                 edge_i, edge_j, jnp.asarray(em_s),
                                 jnp.asarray(em_R), jnp.asarray(em_t),
                                 edge_mask, edge_w, jnp.asarray(fixed))
