"""Sim(3) similarity-transform operations as pure JAX functions.

Replaces the reference's g2o Sim3 machinery (``sim3.h``, ``VertexSim3Expmap``,
``EdgeSim3`` in Thirdparty/g2o/g2o/types/types_seven_dof_expmap.*) used for
monocular loop closing with scale drift (LoopClosing.cc:234-405, essential
graph Optimizer.cc:591-863).

Representation: a Sim3 element ``S = [[s*R, t], [0, 1]]`` stored either as a
(4, 4) matrix or as the tuple ``(R, t, s)``.  Tangent vectors are (7,) arrays
``xi = [rho (3), phi (3), sigma (1)]`` where ``sigma = log s``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def from_Rts(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) Sim3 matrix from rotation, translation, scale."""
    return se3.from_Rt(R * s[..., None, None], t)


def to_Rts(S: jnp.ndarray):
    """Split (..., 4, 4) Sim3 matrix -> (R, t, s)."""
    sR = S[..., :3, :3]
    s = jnp.cbrt(jnp.clip(jnp.linalg.det(sR), 1e-12, None))
    R = sR / s[..., None, None]
    return R, S[..., :3, 3], s


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    """Closed-form Sim3 inverse: (1/s, R^T, -(1/s) R^T t)."""
    R, t, s = to_Rts(S)
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return from_Rts(Rt, -inv_s[..., None] * (Rt @ t[..., None])[..., 0], inv_s)


def transform(S: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply Sim3 (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    return se3.transform(S, points)


def _coeffs(theta, sigma):
    """Coefficients (A, B, C) of W = A*K + B*K^2 + C*I for Sim3 exp.

    Closed-form from Strasdat's "Scale Drift-Aware Large Scale Monocular
    SLAM" (the algorithm family the reference's essential-graph optimizer
    implements); numerically guarded Taylor branches near sigma=0, theta=0.
    """
    eps = 1e-5
    s = jnp.exp(sigma)
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    safe_sig = jnp.where(sig_small, 1.0, sigma)
    safe_th = jnp.where(th_small, 1.0, theta)
    th2 = safe_th * safe_th

    # C = (s - 1) / sigma
    C = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / safe_sig)

    sin_t, cos_t = jnp.sin(safe_th), jnp.cos(safe_th)

    # Both small: A -> 1/2, B -> 1/6.
    a_ss = jnp.where(th_small, 0.5 - theta * theta / 24.0, (1.0 - cos_t) / th2)
    b_ss = jnp.where(th_small, 1.0 / 6.0 - theta * theta / 120.0, (safe_th - sin_t) / (th2 * safe_th))

    # sigma != 0, theta == 0:
    a_s0 = jnp.where(
        sig_small, 0.5, ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    )
    b_s0 = jnp.where(
        sig_small,
        1.0 / 6.0,
        (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0) / (safe_sig**3),
    )

    # General case (sigma != 0, theta != 0):
    denom = safe_sig * safe_sig + th2
    a_gen = ((safe_sig * sin_t + safe_th * (1.0 - s * cos_t) * jnp.ones_like(sin_t))
             * 0.0)  # placeholder, replaced below
    # A = (s*sin(t)*sigma + (1 - s*cos(t))*t) / (t * (sigma^2 + t^2))
    a_gen = (s * sin_t * safe_sig + (1.0 - s * cos_t) * safe_th) / (safe_th * denom)
    # B = (C - ((s*cos(t) - 1)*sigma + s*sin(t)*t) / (sigma^2 + t^2)) / t^2
    b_gen = (C - ((s * cos_t - 1.0) * safe_sig + s * sin_t * safe_th) / denom) / th2

    A = jnp.where(sig_small, a_ss, jnp.where(th_small, a_s0, a_gen))
    B = jnp.where(sig_small, b_ss, jnp.where(th_small, b_s0, b_gen))
    return A, B, C


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential: (..., 7) [rho, phi, sigma] -> (..., 4, 4)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    theta = se3._safe_norm(phi)
    K = se3.hat(phi)
    K2 = K @ K
    A, B, C = _coeffs(theta, sigma)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = A[..., None, None] * K + B[..., None, None] * K2 + C[..., None, None] * eye
    R = se3.so3_exp(phi)
    t = (W @ rho[..., None])[..., 0]
    return from_Rts(R, t, jnp.exp(sigma))


def log(S: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) logarithm: (..., 4, 4) -> (..., 7) [rho, phi, sigma]."""
    R, t, s = to_Rts(S)
    sigma = jnp.log(s)
    phi = se3.so3_log(R)
    theta = se3._safe_norm(phi)
    K = se3.hat(phi)
    K2 = K @ K
    A, B, C = _coeffs(theta, sigma)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), K.shape)
    W = A[..., None, None] * K + B[..., None, None] * K2 + C[..., None, None] * eye
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def compose(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Matrix product of two Sim3s (matrices compose directly)."""
    return S1 @ S2


def from_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Lift an SE3 matrix to Sim3 with scale 1 (identity scale)."""
    return T


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Project Sim3 to SE3: keep rotation, divide translation by scale.

    This is the correction applied to keyframe poses after essential-graph
    optimization in the reference (LoopClosing.cc / Optimizer.cc:824-840:
    ``Tiw = [R, t/s]``).
    """
    R, t, s = to_Rts(S)
    return se3.from_Rt(R, t / s[..., None])


exp_batch = jax.vmap(exp)
log_batch = jax.vmap(log)
