"""Sim3 refinement between two keyframes (reference Optimizer::OptimizeSim3,
Optimizer.cc:865-1063: one VertexSim3Expmap with inverse-pair projection
edges, 10 LM iterations, chi2=10 outlier removal, 10 more).

LM over the 7-dim tangent with autodiff Jacobians (one Sim3 vertex, a few
hundred residuals — jacfwd over 7 inputs is cheap and exact).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3

CHI2_SIM3 = 9.99  # reference th2 = 10


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _project(intr, pc):
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    return jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], axis=-1)


def _residuals(xi, S0, x1, x2, uv1, uv2, intr):
    """Stacked two-way reprojection residuals for S12 = exp(xi) @ S0."""
    S12 = sim3.exp(xi) @ S0
    S21 = sim3.inverse(S12)
    r1 = _project(intr, sim3.transform(S12, x2)) - uv1
    r2 = _project(intr, sim3.transform(S21, x1)) - uv2
    return jnp.concatenate([r1, r2], axis=0)  # [2N, 2]


def optimize_sim3(
    S12_0: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    intr: jnp.ndarray,
    iters: int = 10,
) -> Sim3OptResult:
    inv_s2 = jnp.concatenate(
        [1.0 / jnp.clip(sigma2_1, 1e-8, None), 1.0 / jnp.clip(sigma2_2, 1e-8, None)]
    )

    def chi2_of(S12, active2):
        r = _residuals(jnp.zeros(7), S12, x1, x2, uv1, uv2, intr)
        c = jnp.sum(r * r, axis=-1) * inv_s2
        return jnp.where(active2, c, 0.0)

    def robust_cost(S12, active2):
        c = chi2_of(S12, active2)
        d2 = 10.0
        rho = jnp.where(c <= d2, c, 2.0 * jnp.sqrt(c * d2) - d2)
        return jnp.sum(jnp.where(active2, rho, 0.0))

    def lm(S12, active2, n_iters):
        def body(_, state):
            S12, lam, cost = state
            J = jax.jacfwd(
                lambda xi: _residuals(xi, S12, x1, x2, uv1, uv2, intr)
            )(jnp.zeros(7))  # [2N, 2, 7]
            r = _residuals(jnp.zeros(7), S12, x1, x2, uv1, uv2, intr)
            # Huber IRLS, delta = sqrt(10) (the reference's deltaHuber on
            # Sim3 edges) — without it a handful of gross outliers owns the
            # quadratic cost and the solve diverges.
            chi2 = jnp.sum(r * r, axis=-1) * inv_s2
            from .reprojection import huber_weight

            w = huber_weight(chi2, 3.1623) * jnp.where(active2, inv_s2, 0.0)
            H = jnp.einsum("nki,n,nkj->ij", J, w, J)
            b = jnp.einsum("nki,n,nk->i", J, w, r)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
            delta = -jnp.linalg.solve(Hd, b)
            S_new = sim3.exp(delta) @ S12
            new_cost = robust_cost(S_new, active2)
            ok = new_cost < cost
            S12 = jnp.where(ok, S_new, S12)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return S12, lam, jnp.where(ok, new_cost, cost)

        cost0 = robust_cost(S12, active2)
        S12, _, _ = jax.lax.fori_loop(0, n_iters, body, (S12, jnp.float32(1e-3), cost0))
        return S12

    active2 = jnp.concatenate([valid, valid])
    S12 = lm(S12_0, active2, iters)
    # Outlier removal + second round (Optimizer.cc:987-1037).
    c = chi2_of(S12, active2)
    pair_bad = (c[: x1.shape[0]] > CHI2_SIM3) | (c[x1.shape[0]:] > CHI2_SIM3)
    inlier = valid & ~pair_bad
    active2 = jnp.concatenate([inlier, inlier])
    S12 = lm(S12, active2, iters)
    c = chi2_of(S12, active2)
    pair_bad = (c[: x1.shape[0]] > CHI2_SIM3) | (c[x1.shape[0]:] > CHI2_SIM3)
    inlier = inlier & ~pair_bad
    return Sim3OptResult(
        S12=S12, inliers=inlier, n_inliers=jnp.sum(inlier).astype(jnp.int32)
    )
