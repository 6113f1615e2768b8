"""Two-view monocular bootstrap: fully-batched RANSAC for homography and
fundamental models, model selection, and relative-pose reconstruction.

Re-designs the reference's Initializer (Initializer.cc): where the reference
races two CPU threads running 200 sequential RANSAC iterations each
(FindHomography/FindFundamental, Initializer.cc:104-109), here BOTH model
families and ALL iterations are a single batched device program:

  * hypothesis sampling  -> Gumbel top-8 over the valid-match mask, [I, 8]
  * model fit            -> batched normalized DLT via 9x9 symmetric eigh
  * scoring              -> [I, N] symmetric-transfer / epipolar chi2 maps
  * model select         -> RH = SH / (SH + SF) > 0.40 (Initializer.cc:112-118)
  * reconstruction       -> all 4 E-decompositions + all 8 Faugeras H
                            hypotheses triangulated & cheirality-checked in
                            one [12, N] batch (ReconstructF/H + CheckRT,
                            Initializer.cc:470-933)

Determinism: a fixed jax.random key replaces the reference's seeded
DUtils::Random (Initializer.cc:80).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, triangulation

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991
RANSAC_ITERS = 200
SAMPLE = 8


class InitResult(NamedTuple):
    success: jnp.ndarray  # bool scalar
    used_homography: jnp.ndarray  # bool scalar
    T21: jnp.ndarray  # [4, 4] pose of frame 2 w.r.t. frame 1 (Tcw with frame1 = world)
    points: jnp.ndarray  # [N, 3] triangulated points in frame-1/world coords
    good: jnp.ndarray  # [N] bool triangulated-point validity
    n_good: jnp.ndarray  # int32
    rh: jnp.ndarray  # model-selection score ratio (diagnostic)


def _normalize(xy: jnp.ndarray, valid: jnp.ndarray):
    """Hartley normalization over valid points (Initializer.cc:753-800:
    mean / mean absolute deviation). Returns (normalized xy, 3x3 T)."""
    w = valid.astype(jnp.float32)
    n = jnp.clip(jnp.sum(w), 1.0, None)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(xy - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.clip(dev, 1e-8, None)
    xn = (xy - mean) * s
    T = jnp.array(
        [
            [s[0], 0.0, -mean[0] * s[0]],
            [0.0, s[1], -mean[1] * s[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return xn, T


def _sample_indices(key, valid: jnp.ndarray, iters: int, k: int) -> jnp.ndarray:
    """[iters, k] distinct indices of valid matches (Gumbel top-k per row)."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (iters, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _fit_h_batch(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched homography DLT: [I, 8, 2] x1 -> x2. Returns [I, 3, 3]."""
    iters = x1.shape[0]
    zeros = jnp.zeros_like(x1[..., 0])
    ones = jnp.ones_like(zeros)
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    row1 = jnp.stack([zeros, zeros, zeros, -u, -v, -ones, vp * u, vp * v, vp], axis=-1)
    row2 = jnp.stack([u, v, ones, zeros, zeros, zeros, -up * u, -up * v, -up], axis=-1)
    A = jnp.concatenate([row1, row2], axis=1)  # [I, 16, 9]
    AtA = jnp.einsum("ink,inl->ikl", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    return h.reshape(iters, 3, 3)


def _fit_f_batch(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point fundamental fit with rank-2 projection. [I, 3, 3]."""
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u)
    # Constraint x2^T F x1 = 0 per sample.
    A = jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, ones], axis=-1
    )  # [I, 8, 9]
    AtA = jnp.einsum("ink,inl->ikl", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[..., :, 0].reshape(-1, 3, 3)
    # Enforce rank 2.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt)


def _score_h(H: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray, valid, sigma2: float):
    """[I] scores + [I, N] inliers: symmetric transfer error
    (Initializer.cc:CheckHomography)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(M, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        p = jnp.einsum("iuv,nv->inu", M, ah)
        w = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
        uv = p[..., :2] / w[..., None]
        return jnp.sum((uv - b[None]) ** 2, axis=-1) / sigma2

    chi12 = transfer(H, xy1, xy2)  # x1 -> image 2
    chi21 = transfer(Hinv, xy2, xy1)
    in12 = (chi12 < CHI2_H) & valid[None, :]
    in21 = (chi21 < CHI2_H) & valid[None, :]
    score = jnp.sum(jnp.where(in12, SCORE_TH - chi12, 0.0), axis=1) + jnp.sum(
        jnp.where(in21, SCORE_TH - chi21, 0.0), axis=1
    )
    return score, in12 & in21


def _score_f(F: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray, valid, sigma2: float):
    """[I] scores + [I, N] inliers: epipolar line distance both directions
    (Initializer.cc:CheckFundamental)."""
    ah1 = jnp.concatenate([xy1, jnp.ones_like(xy1[:, :1])], axis=1)
    ah2 = jnp.concatenate([xy2, jnp.ones_like(xy2[:, :1])], axis=1)

    def linedist(lines, b):
        num = jnp.einsum("inu,nu->in", lines[..., :2], b) + lines[..., 2]
        den = jnp.sum(lines[..., :2] ** 2, axis=-1)
        return (num * num) / jnp.clip(den, 1e-12, None)

    l2 = jnp.einsum("iuv,nv->inu", F, ah1)  # F x1: line in image 2
    l1 = jnp.einsum("ivu,nv->inu", F, ah2)  # F^T x2: line in image 1
    chi2_2 = linedist(l2, xy2) / sigma2
    chi2_1 = linedist(l1, xy1) / sigma2
    in2 = (chi2_2 < CHI2_F) & valid[None, :]
    in1 = (chi2_1 < CHI2_F) & valid[None, :]
    score = jnp.sum(jnp.where(in2, SCORE_TH - chi2_2, 0.0), axis=1) + jnp.sum(
        jnp.where(in1, SCORE_TH - chi2_1, 0.0), axis=1
    )
    return score, in1 & in2


def _decompose_f(F: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """4 candidate [R|t] from the essential matrix (Initializer.cc:
    ReconstructF / DecomposeE). Returns [4, 4, 4] SE3 matrices."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.clip(jnp.linalg.norm(t), 1e-12, None)
    return jnp.stack(
        [
            se3.from_Rt(R1, t),
            se3.from_Rt(R1, -t),
            se3.from_Rt(R2, t),
            se3.from_Rt(R2, -t),
        ]
    )


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """8 candidate [R|t] from a homography, Faugeras SVD method
    (Initializer.cc:ReconstructH, hypotheses for d' = +/-d2). [8, 4, 4]."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    eps = 1e-8
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / jnp.clip(d1 * d1 - d3 * d3, eps, None), 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / jnp.clip(d1 * d1 - d3 * d3, eps, None), 0.0, None))
    signs = jnp.array([[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]])

    # Case d' = d2 > 0.
    sin_t = (d1 - d3) * x1 * x3 / jnp.clip(d2, eps, None)
    cos_t = (d2 * d2 + d1 * d3) / jnp.clip(d2 * (d1 + d3), eps, None)

    def case_pos(e):
        e1, e3 = e[0], e[1]
        st = e1 * e3 * sin_t
        Rp = jnp.array(
            [
                [cos_t, 0.0, -st],
                [0.0, 1.0, 0.0],
                [st, 0.0, cos_t],
            ]
        )
        tp = jnp.stack([e1 * x1, 0.0 * e1, -e3 * x3]) * (d1 - d3)
        R = s * U @ Rp @ Vt
        t = (U @ tp)
        return se3.from_Rt(R, t / jnp.clip(jnp.linalg.norm(t), 1e-12, None))

    # Case d' = -d2.
    sin_p = (d1 + d3) * x1 * x3 / jnp.clip(d2, eps, None)
    cos_p = (d1 * d3 - d2 * d2) / jnp.clip(d2 * (d1 - d3), eps, None)

    def case_neg(e):
        e1, e3 = e[0], e[1]
        sp = e1 * e3 * sin_p
        Rp = jnp.array(
            [
                [cos_p, 0.0, sp],
                [0.0, -1.0, 0.0],
                [sp, 0.0, -cos_p],
            ]
        )
        tp = jnp.stack([e1 * x1, 0.0 * e1, e3 * x3]) * (d1 + d3)
        R = s * U @ Rp @ Vt
        t = (U @ tp)
        return se3.from_Rt(R, t / jnp.clip(jnp.linalg.norm(t), 1e-12, None))

    pos = jax.vmap(case_pos)(signs)
    neg = jax.vmap(case_neg)(signs)
    return jnp.concatenate([pos, neg], axis=0)


def _check_rt(
    T21: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    inlier: jnp.ndarray,
    K: jnp.ndarray,
    sigma2: float,
):
    """Cheirality + reprojection scoring of one pose hypothesis over all
    matches (Initializer::CheckRT, Initializer.cc:802-933).

    Returns (n_good, good mask [N], parallax-deg of the 50th-best point,
    points [N, 3]).
    """
    T1 = jnp.eye(4, dtype=T21.dtype)
    P1 = K @ T1[:3, :]
    P2 = K @ T21[:3, :]
    n = xy1.shape[0]
    X = triangulation.triangulate_dlt(
        jnp.broadcast_to(P1, (n, 3, 4)), jnp.broadcast_to(P2, (n, 3, 4)), xy1, xy2
    )
    finite = jnp.isfinite(X).all(axis=-1)
    pc1 = X
    pc2 = se3.transform(T21, X)
    cosp = triangulation.parallax_cosine(T1, T21, X)
    depth_ok = (pc1[..., 2] > 0) & (pc2[..., 2] > 0)

    def reproj(pc, xy):
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
        u = K[0, 0] * pc[..., 0] / z + K[0, 2]
        v = K[1, 1] * pc[..., 1] / z + K[1, 2]
        return (u - xy[..., 0]) ** 2 + (v - xy[..., 1]) ** 2

    err_ok = (reproj(pc1, xy1) < 4.0 * sigma2) & (reproj(pc2, xy2) < 4.0 * sigma2)
    good = inlier & finite & depth_ok & err_ok & (cosp < 0.99998)
    n_good = jnp.sum(good)
    # Parallax of the min(50, n_good)-th best good point, in degrees.
    cos_sorted = jnp.sort(jnp.where(good, cosp, -jnp.inf))[::-1]  # ascending angle
    idx = jnp.clip(jnp.minimum(50, n_good) - 1, 0, n - 1)
    cos_sel = jnp.clip(cos_sorted[idx], -1.0, 1.0)
    parallax_deg = jnp.degrees(jnp.arccos(cos_sel))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)
    return n_good, good, parallax_deg, X


def initialize_two_view(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    sigma: float = 1.0,
    min_parallax_deg: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """Full two-view initialization from aligned match arrays.

    xy1, xy2: [N, 2] undistorted pixel coords of matched features (row i of
    xy2 corresponds to row i of xy1); valid: [N] match mask.
    """
    sigma2 = sigma * sigma
    k_h, k_f = jax.random.split(key)
    n_valid = jnp.sum(valid)

    # --- model fitting over normalized coordinates ---
    x1n, T1n = _normalize(xy1, valid)
    x2n, T2n = _normalize(xy2, valid)
    idx_h = _sample_indices(k_h, valid, RANSAC_ITERS, SAMPLE)
    idx_f = _sample_indices(k_f, valid, RANSAC_ITERS, SAMPLE)

    Hn = _fit_h_batch(x1n[idx_h], x2n[idx_h])
    H = jnp.linalg.inv(T2n) @ Hn @ T1n  # de-normalize (Initializer.cc:150)
    h_scores, h_inliers = _score_h(H, xy1, xy2, valid, sigma2)

    Fn = _fit_f_batch(x1n[idx_f], x2n[idx_f])
    F = T2n.T @ Fn @ T1n  # de-normalize (Initializer.cc:198)
    f_scores, f_inliers = _score_f(F, xy1, xy2, valid, sigma2)

    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH, SF = h_scores[bh], f_scores[bf]
    rh = SH / jnp.clip(SH + SF, 1e-8, None)
    use_h = rh > 0.40  # Initializer.cc:112-118

    # --- reconstruction: evaluate all 12 hypotheses, select by model ---
    cands_f = _decompose_f(F[bf], K)  # [4, 4, 4]
    cands_h = _decompose_h(H[bh], K)  # [8, 4, 4]
    cands = jnp.concatenate([cands_f, cands_h], axis=0)  # [12, 4, 4]
    inl = jnp.where(use_h, h_inliers[bh], f_inliers[bf])

    n_good, good, parallax, X = jax.vmap(
        lambda T: _check_rt(T, xy1, xy2, inl, K, sigma2)
    )(cands)

    # Mask out the family not selected.
    fam = jnp.arange(12) < 4  # True = F-candidates
    allowed = jnp.where(use_h, ~fam, fam)
    n_good_m = jnp.where(allowed, n_good, -1)
    best = jnp.argmax(n_good_m)
    best_n = n_good_m[best]

    n_inl = jnp.sum(inl)
    # Acceptance (ReconstructF: clear winner, enough points, parallax;
    # ReconstructH: second-best < 0.75 * best).
    sorted_n = jnp.sort(n_good_m)[::-1]
    second_n = sorted_n[1]
    min_good = jnp.maximum(
        jnp.int32(min_triangulated), (0.9 * n_inl).astype(jnp.int32)
    )
    distinct = jnp.where(
        use_h,
        second_n.astype(jnp.float32) < 0.75 * best_n.astype(jnp.float32),
        # F path: no other hypothesis close to the winner
        second_n.astype(jnp.float32) < 0.7 * best_n.astype(jnp.float32),
    )
    success = (
        (best_n >= min_good)
        & distinct
        & (parallax[best] > min_parallax_deg)
        & (n_valid >= SAMPLE)
    )

    return InitResult(
        success=success,
        used_homography=use_h,
        T21=cands[best],
        points=X[best],
        good=good[best],
        n_good=best_n.astype(jnp.int32),
        rh=rh,
    )
