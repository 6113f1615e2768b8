"""Parity: mirror-gather kernels vs the row-upload kernels.

The live mapper gathers keyframe feature rows and the point slice from the
device mirror by index (tk.triangulate_mirror_batch / tk.fuse_mirror_batch
— uploads ~100 KB of poses+masks+indices instead of MBs of gathered rows
over the ~50 MB/s tunnel). Both variants must produce IDENTICAL outputs
from the same underlying values — this pins the gather indexing so the two
paths cannot silently drift (advisor r2 finding: the mirror variants were
dead code with no coverage).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from os1_tpu.pipeline import tracking_kernels as tk


N = 64          # features per keyframe
KROWS = 6       # mirror keyframe capacity
ROW_NEW = 2     # mirror row of the "new" keyframe
ROW_NB = 4      # mirror row of the neighbor
FX = FY = 100.0
CX, CY = 40.0, 30.0
SIGMA2 = ((1.2 ** 2) ** np.arange(8)).astype(np.float32)


def _geometry(seed=0):
    """Two views of a shared point cloud with exact-match descriptors, plus
    junk in every other mirror row (wrong gathers would pick the junk)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1.0, -1.0, 4.0], [1.0, 1.0, 8.0], (N, 3)).astype(np.float32)
    T_new = np.eye(4, dtype=np.float32)
    T_nb = np.eye(4, dtype=np.float32)
    T_nb[0, 3] = -0.3  # baseline

    def proj(T):
        pc = X @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], 1
        ).astype(np.float32)

    desc = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint64).astype(np.uint32)
    kf_xy = rng.uniform(0, 80, (KROWS, N, 2)).astype(np.float32)
    kf_angle = np.zeros((KROWS, N), np.float32)
    kf_octave = np.zeros((KROWS, N), np.int32)
    kf_desc = rng.integers(0, 2 ** 32, (KROWS, N, 8), dtype=np.uint64).astype(
        np.uint32
    )
    kf_xy[ROW_NEW], kf_xy[ROW_NB] = proj(T_new), proj(T_nb)
    kf_desc[ROW_NEW] = kf_desc[ROW_NB] = desc
    K33 = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    return X, T_new, T_nb, desc, kf_xy, kf_angle, kf_octave, kf_desc, K33


def test_triangulate_mirror_matches_row_upload():
    (X, T_new, T_nb, desc, kf_xy, kf_angle, kf_octave, kf_desc, K33) = _geometry()
    NB = 2
    all_nb = np.array([ROW_NB, ROW_NEW], np.int32)  # 2nd lane = self (pad)
    T_nbs = np.stack([T_nb, T_new])
    unbound_new = np.ones(N, bool)
    unbound_nb = np.stack([np.ones(N, bool), np.zeros(N, bool)])
    md = np.float32(5.0)

    ref = tk.triangulate_with_neighbors_batch(
        jnp.asarray(T_new), jnp.asarray(T_nbs),
        jnp.asarray(kf_xy[ROW_NEW]), jnp.asarray(kf_desc[ROW_NEW]),
        jnp.asarray(kf_angle[ROW_NEW]), jnp.asarray(kf_octave[ROW_NEW]),
        jnp.asarray(unbound_new),
        jnp.asarray(kf_xy[all_nb]), jnp.asarray(kf_desc[all_nb]),
        jnp.asarray(kf_angle[all_nb]), jnp.asarray(kf_octave[all_nb]),
        jnp.asarray(unbound_nb),
        jnp.asarray(K33), jnp.asarray(SIGMA2), md,
    )
    mir = tk.triangulate_mirror_batch(
        jnp.asarray(T_new), jnp.asarray(T_nbs),
        jnp.int32(ROW_NEW), jnp.asarray(all_nb),
        jnp.asarray(kf_xy), jnp.asarray(kf_angle),
        jnp.asarray(kf_octave), jnp.asarray(kf_desc),
        jnp.asarray(unbound_new), jnp.asarray(unbound_nb),
        jnp.asarray(K33), jnp.asarray(SIGMA2), md,
    )
    accepted = np.asarray(ref[2])
    assert accepted.any(), "fixture should triangulate something"
    # The mirror variant returns the COMPACTED form (tk._pack_tri):
    # unpack it back to dense [NB, N] and compare against the row-upload
    # reference outputs.
    code, pts_c, far_c, nbf_c = (np.asarray(a) for a in mir)
    NB_, N_ = accepted.shape
    acc_m = np.zeros((NB_, N_), bool)
    pts_m = np.zeros((NB_, N_, 3), np.float32)
    far_m = np.zeros((NB_, N_), bool)
    nbi_m = np.full((NB_, N_), -1, np.int32)
    sel = code >= 0
    nb_i, ft_i = code[sel] // N_, code[sel] % N_
    acc_m[nb_i, ft_i] = True
    pts_m[nb_i, ft_i] = pts_c[sel]
    far_m[nb_i, ft_i] = far_c[sel]
    nbi_m[nb_i, ft_i] = nbf_c[sel]
    np.testing.assert_array_equal(accepted, acc_m)
    np.testing.assert_array_equal(
        np.asarray(ref[1])[accepted], pts_m[accepted]
    )
    np.testing.assert_array_equal(np.asarray(ref[3])[accepted], far_m[accepted])
    np.testing.assert_array_equal(
        np.asarray(ref[0])[accepted], nbi_m[accepted]
    )


def test_fuse_mirror_matches_row_upload():
    (X, T_new, T_nb, desc, kf_xy, kf_angle, kf_octave, kf_desc, K33) = _geometry()
    rng = np.random.default_rng(1)
    P = 128  # mirror point capacity
    C = 64   # candidate bucket
    T_cap = 3
    pt_xyz = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    pt_desc = rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint64).astype(np.uint32)
    pt_max_dist = np.full(P, 100.0, np.float32)
    sl = rng.permutation(P)[: N].astype(np.int32)  # point slots of the slice
    pt_xyz[sl] = X          # slice = the visible cloud
    pt_desc[sl] = desc
    # Scale-consistent max distance (as update_point_derived would produce):
    # predicted octave at the observation distance lands on the features'
    # octave 0 instead of being clipped to the pyramid top.
    pt_max_dist[sl] = np.linalg.norm(X, axis=1) * 1.2
    sl_pad = np.concatenate([sl, np.zeros(2 * C - len(sl), np.int32)])

    row_kfs = np.array([ROW_NEW, ROW_NB, 0], np.int32)
    tgt_T = np.stack([T_new, T_nb, np.eye(4, dtype=np.float32)])
    tgt_valid = np.zeros((T_cap, N), bool)
    tgt_valid[:2] = True
    cand_idx = np.zeros((T_cap, C), np.int32)
    cand_valid = np.zeros((T_cap, C), bool)
    cand_idx[:2] = np.arange(C)[None, :]
    cand_valid[:2] = True
    intr = np.array([FX, FY, CX, CY], np.float32)

    args_tail = (
        jnp.asarray(intr), jnp.float32(80.0), jnp.float32(60.0),
        jnp.float32(1.2),
    )
    ref = tk.fuse_batch(
        jnp.asarray(tgt_T),
        jnp.asarray(kf_xy[row_kfs]), jnp.asarray(kf_angle[row_kfs]),
        jnp.asarray(kf_octave[row_kfs]), jnp.asarray(kf_desc[row_kfs]),
        jnp.asarray(tgt_valid), jnp.asarray(cand_idx), jnp.asarray(cand_valid),
        jnp.asarray(pt_xyz[sl_pad]), jnp.asarray(pt_desc[sl_pad]),
        jnp.asarray(np.nan_to_num(pt_max_dist[sl_pad], posinf=1e9)),
        *args_tail, n_levels=8,
    )
    mir = tk.fuse_mirror_batch(
        jnp.asarray(tgt_T), jnp.asarray(row_kfs),
        jnp.asarray(kf_xy), jnp.asarray(kf_angle),
        jnp.asarray(kf_octave), jnp.asarray(kf_desc),
        jnp.asarray(tgt_valid), jnp.asarray(cand_idx), jnp.asarray(cand_valid),
        jnp.asarray(sl_pad),
        jnp.asarray(pt_xyz), jnp.asarray(pt_desc), jnp.asarray(pt_max_dist),
        *args_tail, n_levels=8,
    )
    ref, mir = np.asarray(ref), np.asarray(mir)
    assert (ref >= 0).any(), "fixture should fuse something"
    np.testing.assert_array_equal(ref, mir)
