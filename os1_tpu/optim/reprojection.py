"""Monocular reprojection residuals and analytic Jacobians.

The functional replacement for g2o's edge types (EdgeSE3ProjectXYZ /
EdgeSE3ProjectXYZOnlyPose, reference Thirdparty/g2o types_six_dof_expmap.*):
pure functions over (pose, point, measurement) that vmap over observation
arrays and feed the batched LM solvers.

Pose parametrization: left-multiplicative se3 increment, T <- exp(xi) @ T
(the same convention as g2o's VertexSE3Expmap::oplusImpl, so the reference's
iteration counts and damping behavior transfer).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3

HUBER_MONO = 2.447651  # sqrt(5.991), reference Optimizer.cc thHuber


def project_point(Tcw: jnp.ndarray, X: jnp.ndarray, intr: jnp.ndarray):
    """Camera-frame point and pixel projection.

    intr: [4] (fx, fy, cx, cy) — operates on undistorted pixel coords, as all
    reference optimizers do (they use mvKeysUn + bare K).
    Returns (pc [..., 3], uv [..., 2]).
    """
    pc = se3.transform(Tcw, X)
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    uv = jnp.stack(
        [fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], axis=-1
    )
    return pc, uv


def residual(Tcw, X, uv_obs, intr):
    """r = projection - measurement, [..., 2]."""
    _, uv = project_point(Tcw, X, intr)
    return uv - uv_obs


def _jac_proj_pc(pc: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(pc): [..., 2, 3]."""
    fx, fy = intr[0], intr[1]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    zi = 1.0 / z
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1)
    row_v = jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def jacobians(Tcw, X, intr):
    """Residual Jacobians for a left-multiplicative pose update and the point.

    Returns (r [..., 2] is NOT included — call residual), J_pose [..., 2, 6]
    (d r / d xi, xi = [rho, phi]), J_point [..., 2, 3] (d r / d X_world).
    """
    pc = se3.transform(Tcw, X)
    Jp = _jac_proj_pc(pc, intr)
    # d pc / d xi = [I | -[pc]x] for T <- exp(xi) T.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    J_xi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [..., 3, 6]
    J_pose = Jp @ J_xi
    R = Tcw[..., :3, :3]
    J_point = Jp @ R
    return J_pose, J_point


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel at squared error chi2 (delta in the
    same units as the residual norm)."""
    r = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
    return jnp.where(r <= delta, 1.0, delta / r)
