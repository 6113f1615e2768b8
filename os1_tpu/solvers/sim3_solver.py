"""Batched RANSAC Sim(3) solver: similarity alignment between two keyframes'
matched 3D points (reference Sim3Solver.cc — Horn 1987 closed-form absolute
orientation with scale, Sim3Solver.cc:229-342, inside a sequential RANSAC;
here all hypotheses run as one batch of 4x4 symmetric eigendecompositions).

Convention: computes S12 such that  x1 ~ S12 @ x2  for 3D points expressed
in each keyframe's CAMERA frame (matching the reference, which feeds
camera-frame coordinates and checks reprojection in both images).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3

ITERS = 128
SAMPLE = 3
CHI2 = 9.21  # 2-dof 99% (reference mvnMaxError 9.210 * sigma^2)


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    S12: jnp.ndarray  # [4, 4] Sim3: frame-2 camera coords -> frame-1
    inliers: jnp.ndarray  # [N]
    n_inliers: jnp.ndarray


def _horn(p1: jnp.ndarray, p2: jnp.ndarray):
    """Closed-form Sim3 from [s, 3] point sets (x1 ~ s R x2 + t).

    Horn's quaternion method: the optimal rotation is the largest-eigenvalue
    eigenvector of the 4x4 N matrix built from the cross-covariance.
    """
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1  # [3, 3] cross-covariance (2 -> 1)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # [w, x, y, z]
    w, x, y, z = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    # Scale (asymmetric form, as the reference's ComputeSim3): s = trace(D R^T
    # aligned) / variance of q2.
    rot_q2 = q2 @ R.T
    s = jnp.sum(q1 * rot_q2) / jnp.clip(jnp.sum(q2 * q2), 1e-12, None)
    t = c1 - s * (R @ c2)
    return R, t, s


def _project(intr, pc):
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    return jnp.stack(
        [fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], axis=-1
    )


def solve_sim3(
    x1: jnp.ndarray,  # [N, 3] points in camera-1 frame
    x2: jnp.ndarray,  # [N, 3] matched points in camera-2 frame
    valid: jnp.ndarray,
    uv1: jnp.ndarray,  # [N, 2] measured pixels in image 1
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    intr: jnp.ndarray,
    key: jnp.ndarray,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    """RANSAC Horn alignment with two-way reprojection inlier check
    (Sim3Solver::CheckInliers reprojects both directions). min_inliers=20
    matches LoopClosing.cc:297."""
    n = x1.shape[0]
    g = jax.random.gumbel(key, (ITERS, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, SAMPLE)

    R, t, s = jax.vmap(_horn)(x1[idx], x2[idx])  # [I, ...]
    s = jnp.clip(s, 0.01, 100.0)
    if fix_scale:
        s = jnp.ones_like(s)

    def count_inliers(R, t, s):
        S12 = sim3.from_Rts(R, t, s)
        S21 = sim3.inverse(S12)
        p1_from_2 = sim3.transform(S12, x2)  # into camera-1 frame
        p2_from_1 = sim3.transform(S21, x1)
        e1 = jnp.sum((_project(intr, p1_from_2) - uv1) ** 2, axis=-1) / jnp.clip(
            sigma2_1, 1e-8, None
        )
        e2 = jnp.sum((_project(intr, p2_from_1) - uv2) ** 2, axis=-1) / jnp.clip(
            sigma2_2, 1e-8, None
        )
        inl = (e1 < CHI2) & (e2 < CHI2) & valid
        inl &= (p1_from_2[..., 2] > 0) & (p2_from_1[..., 2] > 0)
        return inl

    inl = jax.vmap(count_inliers)(R, t, s)  # [I, N]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # Refit on inliers of the best hypothesis.
    w = inl[best].astype(x1.dtype)

    def weighted_horn():
        sw = jnp.clip(jnp.sum(w), 1.0, None)
        c1 = jnp.sum(x1 * w[:, None], axis=0) / sw
        c2 = jnp.sum(x2 * w[:, None], axis=0) / sw
        q1 = (x1 - c1) * w[:, None]
        q2 = (x2 - c2) * w[:, None]
        M = q2.T @ (x1 - c1)
        N4 = jnp.array(
            [
                [M[0, 0] + M[1, 1] + M[2, 2], M[1, 2] - M[2, 1], M[2, 0] - M[0, 2], M[0, 1] - M[1, 0]],
                [M[1, 2] - M[2, 1], M[0, 0] - M[1, 1] - M[2, 2], M[0, 1] + M[1, 0], M[2, 0] + M[0, 2]],
                [M[2, 0] - M[0, 2], M[0, 1] + M[1, 0], -M[0, 0] + M[1, 1] - M[2, 2], M[1, 2] + M[2, 1]],
                [M[0, 1] - M[1, 0], M[2, 0] + M[0, 2], M[1, 2] + M[2, 1], -M[0, 0] - M[1, 1] + M[2, 2]],
            ]
        )
        _, vecs = jnp.linalg.eigh(N4)
        q = vecs[:, -1]
        ww, x, y, z = q[0], q[1], q[2], q[3]
        Rr = jnp.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - ww * z), 2 * (x * z + ww * y)],
                [2 * (x * y + ww * z), 1 - 2 * (x * x + z * z), 2 * (y * z - ww * x)],
                [2 * (x * z - ww * y), 2 * (y * z + ww * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        rot_q2 = (x2 - c2) @ Rr.T
        sr = jnp.sum((x1 - c1) * rot_q2 * w[:, None]) / jnp.clip(
            jnp.sum((x2 - c2) ** 2 * w[:, None]), 1e-12, None
        )
        sr = jnp.clip(sr, 0.01, 100.0)
        if fix_scale:
            sr = jnp.ones_like(sr)
        tr = c1 - sr * (Rr @ c2)
        return Rr, tr, sr

    Rr, tr, sr = weighted_horn()
    inl_ref = count_inliers(Rr, tr, sr)
    use_ref = jnp.sum(inl_ref) >= counts[best]
    R_out = jnp.where(use_ref, Rr, R[best])
    t_out = jnp.where(use_ref, tr, t[best])
    s_out = jnp.where(use_ref, sr, s[best])
    inl_out = jnp.where(use_ref, inl_ref, inl[best])
    n_out = jnp.sum(inl_out)
    return Sim3Result(
        success=n_out >= min_inliers,
        S12=sim3.from_Rts(R_out, t_out, s_out),
        inliers=inl_out,
        n_inliers=n_out.astype(jnp.int32),
    )
