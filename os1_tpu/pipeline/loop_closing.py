"""Loop closing: BoW detection with consistency groups, Sim3 computation,
loop correction + essential-graph optimization (reference LoopClosing.cc).

Runs synchronously after local mapping for each new keyframe (the reference
runs it on its own thread with a keyframe queue; the device programs are
identical — host pipelining is an orchestration concern).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3, sim3
from ..map.store import MapStore
from ..matching import core as mcore
from ..optim.pose_graph import optimize_pose_graph
from ..optim.sim3_opt import optimize_sim3
from ..solvers.sim3_solver import solve_sim3
from ..vocab.database import KeyFrameDatabase
from .config import SlamConfig

MIN_MATCHES_SIM3 = 20  # LoopClosing.cc:269
MIN_INLIERS_SIM3 = 20  # LoopClosing.cc:297 / Optimizer nInliers >= 20
MIN_TOTAL_MATCHES = 40  # LoopClosing.cc:387
CONSISTENCY_TH = 3  # LoopClosing.cc:53 mnCovisibilityConsistencyTh
SIM3_CAP = 512  # padded match capacity (variable shapes would recompile)
PROJ_CAP = 4096  # padded loop-region point capacity for guided projection


@jax.jit
def _match_bound_features(desc1, bound1, angle1, desc2, bound2, angle2):
    """Descriptor matching between point-bound features of two keyframes
    (the reference's SearchByBoW(KF, KF), ORBmatcher.cc:517-650)."""
    gate = bound1[:, None] & bound2[None, :]
    res = mcore.match_with_gate(desc1, desc2, gate, max_dist=mcore.TH_LOW, ratio=0.75)
    res = mcore.mutual_best(res, desc2.shape[0])
    return mcore.rotation_consistency(angle1, angle2, res)


@dataclass
class LoopCloser:
    cfg: SlamConfig
    store: MapStore
    db: KeyFrameDatabase
    run_global_ba: bool = True  # global BA after every corrected loop
    last_loop_kf: int = -100
    consistent_groups: list = field(default_factory=list)  # [(set, count)]
    loop_edges: list = field(default_factory=list)  # [(kf_a, kf_b)]
    n_loops_closed: int = 0
    # Async wiring (None in the synchronous pipeline): the map lock shared
    # with tracker/mapper, and the MappingWorker to stop during correction
    # (the reference's LocalMapping::RequestStop barrier before CorrectLoop,
    # LoopClosing.cc:413-431).
    lock: object = None  # threading.RLock | None
    mapping_worker: object = None
    on_map_updated: object = None  # callback() after async GBA writeback
    timer: object = None  # StageTimer | None

    def __post_init__(self):
        self._key = jax.random.PRNGKey(7)
        self._intr = jnp.asarray(self.cfg.intr)
        self._gba_thread = None  # transient GBA thread (LoopClosing.cc:584)
        self._stop_gba = False  # mbStopGBA (LoopClosing.cc:416-425)
        if self.lock is None:
            import contextlib

            self.lock = contextlib.nullcontext()
        if self.timer is None:
            from ..utils.profiling import StageTimer

            self.timer = StageTimer()

    # ------------------------------------------------------------------ #
    def process(self, kf: int, kf_count: int) -> bool:
        """Full loop-closing attempt for a new keyframe. Returns True if a
        loop was closed."""
        with self.lock:
            if not self.store.kf_valid[kf]:
                return False  # culled before the loop thread got to it
            with self.timer("loop.detect"):
                candidates = self.detect(kf, kf_count)
            hits = []
            for cand in candidates:
                with self.timer("loop.sim3"):
                    ok, S_cl, matched_pts = self.compute_sim3(kf, int(cand))
                if ok:
                    hits.append((int(cand), S_cl, matched_pts))
                    break
        if not hits:
            return False
        cand, S_cl, matched_pts = hits[0]
        # A running global BA belongs to a previous (now superseded) loop:
        # abort and join it before correcting (LoopClosing.cc:416-425).
        self._abort_running_gba()
        # Quiesce local mapping before mutating the whole map — without this
        # barrier a mapper stage dispatched on pre-loop poses would write
        # back over the corrected ones (LoopClosing.cc:413-431 semantics).
        if self.mapping_worker is not None:
            self.mapping_worker.request_stop()
            self.mapping_worker.wait_stopped(timeout=60.0)
        try:
            with self.lock:
                if self.store.kf_valid[kf] and self.store.kf_valid[cand]:
                    self.correct(kf, cand, S_cl, matched_pts)
                    self.last_loop_kf = kf_count
                    self.n_loops_closed += 1
        finally:
            if self.mapping_worker is not None:
                self.mapping_worker.release()
        if self.run_global_ba:
            self._spawn_gba()
        return True

    # ------------------------------------------------------------------ #
    # Global bundle adjustment (RunGlobalBundleAdjustment, LoopClosing.cc:
    # 653-752): runs in a detached thread after every corrected loop,
    # abortable by the next loop, with correction propagation to keyframes
    # and points created while it solved.
    # ------------------------------------------------------------------ #
    def _abort_running_gba(self):
        t = self._gba_thread
        if t is not None and t.is_alive():
            self._stop_gba = True
            t.join(timeout=120.0)
        self._gba_thread = None

    def _spawn_gba(self):
        import threading

        self._stop_gba = False
        if self.mapping_worker is None:
            self._run_gba()  # synchronous pipeline: deterministic inline GBA
            return
        self._gba_thread = threading.Thread(
            target=self._run_gba, daemon=True, name="GlobalBA"
        )
        self._gba_thread.start()

    def _run_gba(self, iters: int = 20, chunk: int = 5):
        from ..optim import ba_begin, ba_iterate, ba_result
        from .local_mapping import apply_global_ba, assemble_global_ba

        with self.lock:
            work = assemble_global_ba(self.store, self.cfg)
        if work is None:
            return
        prob, meta = work
        state = jax.jit(ba_begin)(prob)
        it = jax.jit(ba_iterate, static_argnames=("n",))
        for _ in range(max(1, iters // chunk)):
            if self._stop_gba:
                return  # aborted by a newer loop: discard (LoopClosing.cc:672)
            state = jax.block_until_ready(it(prob, state, n=chunk))
        res = jax.device_get(jax.jit(ba_result)(prob, state))
        if self._stop_gba:
            return
        # Stop local mapping while corrections propagate (LoopClosing.cc:686).
        if self.mapping_worker is not None:
            self.mapping_worker.request_stop()
            self.mapping_worker.wait_stopped(timeout=60.0)
        try:
            with self.lock:
                apply_global_ba(self.store, self.cfg, res, meta)
            if self.on_map_updated is not None:
                self.on_map_updated()
        finally:
            if self.mapping_worker is not None:
                self.mapping_worker.release()

    # ------------------------------------------------------------------ #
    def detect(self, kf: int, kf_count: int) -> np.ndarray:
        """DetectLoop (LoopClosing.cc:104-232): BoW candidates filtered by
        neighbor min-score and covisibility-consistency accumulation."""
        st = self.store
        if kf_count < self.last_loop_kf + 10:  # LoopClosing.cc:115
            return np.empty(0, np.int64)
        neighbors = st.covisible_keyframes(kf, min_weight=15)
        if len(neighbors) == 0:
            return np.empty(0, np.int64)

        bow_kf = self.db.bows[kf]
        if bow_kf is None:
            return np.empty(0, np.int64)
        # Minimum acceptable score: the worst covisible-neighbor similarity
        # (LoopClosing.cc:125-139).
        scores = [self.db.score_kf(bow_kf, int(n)) for n in neighbors]
        min_score = float(min(scores)) if scores else 0.0

        exclude = np.concatenate([[kf], neighbors])
        cands = self.db.detect_loop_candidates(
            bow_kf, exclude=exclude, min_score=min_score,
            covis_fn=lambda k: st.covisible_keyframes(k, top=10),
        )
        if len(cands) == 0:
            self.consistent_groups = []
            return np.empty(0, np.int64)

        # Consistency groups (LoopClosing.cc:153-227).
        accepted = []
        new_groups = []
        group_used = [False] * len(self.consistent_groups)
        for c in cands:
            c = int(c)
            group = set(int(x) for x in st.covisible_keyframes(c, min_weight=15))
            group.add(c)
            best_count = 0
            for gi, (prev_set, prev_count) in enumerate(self.consistent_groups):
                if group & prev_set:
                    best_count = max(best_count, prev_count + 1)
                    group_used[gi] = True
            new_groups.append((group, best_count))
            if best_count >= CONSISTENCY_TH:
                accepted.append(c)
        self.consistent_groups = new_groups
        return np.array(accepted, np.int64)

    # ------------------------------------------------------------------ #
    def compute_sim3(self, kf: int, cand: int):
        """ComputeSim3 (LoopClosing.cc:234-405) for one candidate. Returns
        (ok, S_cl Sim3 cand-camera -> kf-camera, matched pair array
        [N, 2] (kf_feat, cand_feat))."""
        st = self.store
        obs1 = st.kf_obs_point[kf]
        obs2 = st.kf_obs_point[cand]
        bound1 = (obs1 >= 0) & st.pt_valid[np.clip(obs1, 0, None)]
        bound2 = (obs2 >= 0) & st.pt_valid[np.clip(obs2, 0, None)]
        res = _match_bound_features(
            jnp.asarray(st.kf_desc[kf]), jnp.asarray(bound1),
            jnp.asarray(st.kf_angle[kf]),
            jnp.asarray(st.kf_desc[cand]), jnp.asarray(bound2),
            jnp.asarray(st.kf_angle[cand]),
        )
        ok_np = np.asarray(res.ok)
        if ok_np.sum() < MIN_MATCHES_SIM3:
            return False, None, None
        idx_np = np.asarray(res.idx)
        f1 = np.nonzero(ok_np)[0][:SIM3_CAP]
        f2 = idx_np[f1]
        p1 = obs1[f1]
        p2 = obs2[f2]

        # Camera-frame coordinates of the matched points in both frames,
        # padded to a FIXED capacity (variable lengths would recompile the
        # Sim3 solvers on every candidate).
        n = len(f1)
        pad = SIM3_CAP - n
        T1 = st.kf_T[kf]
        T2 = st.kf_T[cand]
        x1 = np.zeros((SIM3_CAP, 3), np.float32)
        x2 = np.zeros((SIM3_CAP, 3), np.float32)
        x1[:n] = st.pt_xyz[p1] @ T1[:3, :3].T + T1[:3, 3]
        x2[:n] = st.pt_xyz[p2] @ T2[:3, :3].T + T2[:3, 3]
        uv1 = np.zeros((SIM3_CAP, 2), np.float32)
        uv2 = np.zeros((SIM3_CAP, 2), np.float32)
        uv1[:n] = st.kf_xy[kf, f1]
        uv2[:n] = st.kf_xy[cand, f2]
        s2_1 = np.ones(SIM3_CAP, np.float32)
        s2_2 = np.ones(SIM3_CAP, np.float32)
        s2_1[:n] = self.cfg.sigma2_table[st.kf_octave[kf, f1]]
        s2_2[:n] = self.cfg.sigma2_table[st.kf_octave[cand, f2]]
        mask = np.arange(SIM3_CAP) < n

        self._key, sub = jax.random.split(self._key)
        ransac = solve_sim3(
            jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(mask),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(s2_1), jnp.asarray(s2_2),
            self._intr, sub, min_inliers=MIN_INLIERS_SIM3,
        )
        if not bool(ransac.success):
            return False, None, None

        opt = optimize_sim3(
            ransac.S12,
            jnp.asarray(x1), jnp.asarray(x2),
            ransac.inliers & jnp.asarray(mask),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(s2_1), jnp.asarray(s2_2),
            self._intr,
        )
        if int(opt.n_inliers) < MIN_INLIERS_SIM3:
            return False, None, None

        inl = np.asarray(opt.inliers)[:n]
        # Guided projection acceptance: project loop-region points into the
        # current KF through the corrected pose and count total agreement
        # (LoopClosing.cc:341-389 SearchByProjection >= 40).
        S_cl = np.asarray(opt.S12)
        n_total = self._count_projected_matches(kf, cand, S_cl)
        if n_total < MIN_TOTAL_MATCHES:
            return False, None, None
        pairs = np.stack([f1[inl], f2[inl]], axis=1)
        return True, S_cl, pairs

    def _count_projected_matches(self, kf: int, cand: int, S_cl: np.ndarray) -> int:
        """Project the loop region's map points into the current keyframe via
        the Sim3-corrected pose and count descriptor-consistent matches."""
        st = self.store
        region = [cand] + [int(k) for k in st.covisible_keyframes(cand, top=10)]
        pts = st.kf_obs_point[region]
        pts = np.unique(pts[pts >= 0])
        pts = pts[st.pt_valid[pts]][:PROJ_CAP]
        if len(pts) == 0:
            return 0
        n_real = len(pts)
        pts = np.concatenate([pts, np.zeros(PROJ_CAP - n_real, np.int64)])
        T_lw = st.kf_T[cand]
        S_cw = S_cl @ T_lw  # corrected world -> current-camera (Sim3)
        pc = st.pt_xyz[pts] @ S_cw[:3, :3].T + S_cw[:3, 3]
        ok_depth = (pc[:, 2] > 0.05) & (np.arange(PROJ_CAP) < n_real)
        fx, fy, cx, cy = self.cfg.intr
        z = np.where(np.abs(pc[:, 2]) < 1e-8, 1e-8, pc[:, 2])
        uv = np.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], 1)
        from ..matching import matchers
        from ..features.orb import FrameFeatures

        n_feat = self.cfg.orb.n_features
        feats = FrameFeatures(
            xy=jnp.asarray(st.kf_xy[kf]),
            response=jnp.zeros(n_feat),
            angle=jnp.asarray(st.kf_angle[kf]),
            octave=jnp.asarray(st.kf_octave[kf]),
            desc=jnp.asarray(st.kf_desc[kf]),
            valid=jnp.asarray(st.kf_feat_valid[kf]),
        )
        P = len(pts)
        res = matchers.search_by_projection(
            point_desc=jnp.asarray(st.pt_desc[pts]),
            point_uv=jnp.asarray(uv.astype(np.float32)),
            point_valid=jnp.asarray(ok_depth),
            point_octave=jnp.zeros(P, jnp.int32),
            feats=feats,
            radius=jnp.full(P, 8.0),
            ratio=1.0,
            max_dist=mcore.TH_LOW,
            octave_lo=-8, octave_hi=8,
        )
        return int(np.asarray(res.ok).sum())

    # ------------------------------------------------------------------ #
    def correct(self, kf: int, cand: int, S_cl: np.ndarray, pairs: np.ndarray):
        """CorrectLoop (LoopClosing.cc:407-592): propagate the Sim3
        correction over the current covisible group, fuse duplicate points,
        optimize the essential graph, record the loop edge."""
        st = self.store
        K = st.cfg.max_keyframes

        T_lw = st.kf_T[cand]
        S_cw_corr = (S_cl @ T_lw).astype(np.float32)  # Sim3 world -> current

        group = [kf] + [int(k) for k in st.covisible_keyframes(kf, min_weight=15)]
        old_T = {i: st.kf_T[i].copy() for i in group}
        corr_S = {}
        T_cur = st.kf_T[kf]
        for i in group:
            T_ic = old_T[i] @ np.linalg.inv(T_cur)  # SE3 current -> i
            corr_S[i] = (T_ic @ S_cw_corr).astype(np.float32)

        # Correct the group's map points through their first observing
        # group-keyframe (LoopClosing.cc:460-487). Batched per keyframe:
        # each keyframe's uncorrected points move through ONE pair of
        # affine transforms instead of a per-point Python loop (seconds at
        # reference point counts).
        corrected = np.zeros(st.cfg.max_points, bool)
        for i in group:
            obs = st.kf_obs_point[i]
            pids = np.unique(obs[obs >= 0])
            pids = pids[st.pt_valid[pids] & ~corrected[pids]]
            if len(pids) == 0:
                continue
            corrected[pids] = True
            S_new_inv = np.asarray(sim3.inverse(jnp.asarray(corr_S[i])))
            xc = st.pt_xyz[pids] @ old_T[i][:3, :3].T + old_T[i][:3, 3]
            st.pt_xyz[pids] = xc @ S_new_inv[:3, :3].T + S_new_inv[:3, 3]
        # Update group keyframe poses to the (scale-normalized) corrections.
        for i in group:
            st.kf_T[i] = np.asarray(sim3.to_se3(jnp.asarray(corr_S[i])))

        # Loop fusion: the matched pairs reference the same physical point —
        # replace the current-side point with the loop-side one
        # (LoopClosing.cc:525-541).
        obs_cur = st.kf_obs_point[kf]
        for fc, fl in pairs:
            p_cur = int(obs_cur[fc])
            p_loop = int(st.kf_obs_point[cand, fl])
            if p_cur == p_loop or p_cur < 0 or p_loop < 0:
                continue
            if not (st.pt_valid[p_cur] and st.pt_valid[p_loop]):
                continue
            # Move all observations of p_cur onto p_loop.
            for s in range(st.pt_n_obs[p_cur]):
                okf, oft = int(st.pt_obs_kf[p_cur, s]), int(st.pt_obs_feat[p_cur, s])
                if okf < 0:
                    continue
                st.kf_obs_point[okf, oft] = -1
                st.add_observation(p_loop, okf, oft)
            st.pt_valid[p_cur] = False
            st.pt_obs_kf[p_cur] = -1
            st.pt_obs_feat[p_cur] = -1
            st.pt_n_obs[p_cur] = 0

        # ----- essential graph -----
        live = np.nonzero(st.kf_valid)[0]
        S_nodes = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        S_nodes[live] = st.kf_T[live]
        for i in group:  # corrected nodes start from their Sim3 corrections
            S_nodes[i] = corr_S[i]

        edges = set()
        # Spanning tree: the maintained parent links (KeyFrame::GetParent,
        # the reference's essential-graph backbone, Optimizer.cc:655-670).
        for i in live:
            p = int(st.kf_parent[int(i)])
            if p >= 0 and st.kf_valid[p]:
                edges.add((p, int(i)))
        # Strong covisibility edges (minFeat = 100, Optimizer.cc:617).
        for i in live:
            w = st.covisibility_weights(int(i))
            for j in np.nonzero(w >= 100)[0]:
                if j > i:
                    edges.add((int(i), int(j)))
        # Loop edges (past + new).
        for a, b in self.loop_edges:
            if st.kf_valid[a] and st.kf_valid[b]:
                edges.add((min(a, b), max(a, b)))

        ei = np.array([e[0] for e in edges], np.int32)
        ej = np.array([e[1] for e in edges], np.int32)
        # Measurements from PRE-correction poses (NonCorrectedSim3) except
        # for edges inside the corrected group, which use corrected ones;
        # plus the new loop edge from the computed Sim3.
        pre = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        pre[live] = st.kf_T[live]
        for i in group:
            pre[i] = old_T[i]
        eS = np.einsum("eij,ejk->eik", pre[ej], np.linalg.inv(pre[ei]))
        ei = np.concatenate([ei, [np.int32(cand)]])
        ej = np.concatenate([ej, [np.int32(kf)]])
        eS = np.concatenate([eS, S_cw_corr[None] @ np.linalg.inv(st.kf_T[cand])[None]])

        fixed = np.zeros(K, bool)
        fixed[cand] = True  # LoopClosing fixes the loop keyframe (Opt.cc:620)

        # Pre-graph reference pose per KF for point remapping: group KFs'
        # points were ALREADY moved by the Sim3 correction, so their
        # reference is corr_S (the reference's CorrectedSim3 map), not the
        # pre-loop pose — using old_T here would double-correct them.
        old_pose_all = {int(i): st.kf_T[int(i)].copy() for i in live}
        old_pose_all.update({i: corr_S[i] for i in group})

        S_opt = np.asarray(
            optimize_pose_graph(
                jnp.asarray(S_nodes),
                jnp.asarray(st.kf_valid),
                jnp.asarray(fixed),
                jnp.asarray(ei), jnp.asarray(ej),
                jnp.asarray(eS.astype(np.float32)),
                jnp.ones(len(ei), bool),
                iters=20,
            )
        )
        # Write back poses and remap all points via their reference KF —
        # batched per keyframe (one affine transform over its uncorrected
        # points), matching Optimizer.cc:833-861's per-point remap.
        new_T = np.asarray(sim3.to_se3(jnp.asarray(S_opt)))
        pt_done = np.zeros(st.cfg.max_points, bool)
        for i in live:
            i = int(i)
            obs = st.kf_obs_point[i]
            pids = np.unique(obs[obs >= 0])
            pids = pids[st.pt_valid[pids] & ~pt_done[pids]]
            if len(pids) == 0:
                continue
            pt_done[pids] = True
            S_old_i = sim3.from_se3(jnp.asarray(old_pose_all[i]))
            corr = np.asarray(
                sim3.inverse(jnp.asarray(S_opt[i])) @ jnp.asarray(S_old_i)
            )
            st.pt_xyz[pids] = st.pt_xyz[pids] @ corr[:3, :3].T + corr[:3, 3]
        st.kf_T[live] = new_T[live]

        self.loop_edges.append((min(kf, cand), max(kf, cand)))
        st.update_point_derived(
            np.nonzero(pt_done)[0],
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
        )

        # Global BA runs AFTER correct() returns: detached + abortable in the
        # async pipeline, inline in the synchronous one (see _spawn_gba /
        # reference LoopClosing.cc:584).
