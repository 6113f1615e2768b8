"""Unit tests for the loop-closing solvers: Sim3 RANSAC/Horn, Sim3 LM
refinement, and essential-graph optimization."""
import numpy as np
import jax
import jax.numpy as jnp

from os1_tpu.geometry import sim3, se3
from os1_tpu.solvers.sim3_solver import solve_sim3
from os1_tpu.optim.sim3_opt import optimize_sim3
from os1_tpu.optim.pose_graph import optimize_pose_graph

INTR = jnp.asarray([400.0, 400.0, 320.0, 240.0])


def project(pc):
    return np.stack(
        [400 * pc[..., 0] / pc[..., 2] + 320, 400 * pc[..., 1] / pc[..., 2] + 240],
        -1,
    ).astype(np.float32)


def make_sim3_case(rng, n=100, scale=1.4, outliers=0):
    """Points in camera-2 frame; camera-1 sees them through S12."""
    x2 = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    x2[:, 2] += 6.0
    xi = np.array([0.3, -0.2, 0.1, 0.05, -0.1, 0.08, np.log(scale)], np.float32)
    S12 = np.asarray(sim3.exp(jnp.asarray(xi)))
    x1 = np.asarray(sim3.transform(jnp.asarray(S12), jnp.asarray(x2)))
    uv1 = project(x1)
    uv2 = project(x2)
    if outliers:
        bad = rng.choice(n, outliers, replace=False)
        x2[bad] += rng.uniform(1, 3, size=(outliers, 3))
    return x1, x2, uv1, uv2, S12


class TestSim3Solver:
    def test_exact(self, rng):
        x1, x2, uv1, uv2, S12 = make_sim3_case(rng)
        res = solve_sim3(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1), bool),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(x1)), jnp.ones(len(x1)),
            INTR, jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.S12), S12, atol=2e-2)
        _, _, s = sim3.to_Rts(res.S12)
        assert abs(float(s) - 1.4) < 0.02

    def test_outliers(self, rng):
        x1, x2, uv1, uv2, S12 = make_sim3_case(rng, n=150, outliers=50)
        res = solve_sim3(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(150, bool),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(150), jnp.ones(150),
            INTR, jax.random.PRNGKey(1),
        )
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.S12), S12, atol=5e-2)
        assert int(res.n_inliers) >= 90

    def test_fix_scale(self, rng):
        x1, x2, uv1, uv2, _ = make_sim3_case(rng, scale=1.0)
        res = solve_sim3(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1), bool),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(x1)), jnp.ones(len(x1)),
            INTR, jax.random.PRNGKey(2), fix_scale=True,
        )
        _, _, s = sim3.to_Rts(res.S12)
        assert abs(float(s) - 1.0) < 1e-4


class TestSim3Opt:
    def test_refines_noisy_init(self, rng):
        x1, x2, uv1, uv2, S12 = make_sim3_case(rng)
        noise = jnp.asarray(
            np.array([0.03, -0.02, 0.01, 0.01, -0.02, 0.015, 0.05], np.float32)
        )
        S0 = np.asarray(sim3.exp(noise)) @ S12
        res = optimize_sim3(
            jnp.asarray(S0), jnp.asarray(x1), jnp.asarray(x2),
            jnp.ones(len(x1), bool), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(x1)), jnp.ones(len(x1)), INTR,
        )
        np.testing.assert_allclose(np.asarray(res.S12), S12, atol=3e-3)
        assert int(res.n_inliers) == len(x1)

    def test_drops_outlier_pairs(self, rng):
        x1, x2, uv1, uv2, S12 = make_sim3_case(rng, n=120)
        x2c = x2.copy()
        x2c[:15] += 2.0
        res = optimize_sim3(
            jnp.asarray(S12), jnp.asarray(x1), jnp.asarray(x2c),
            jnp.ones(120, bool), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(120), jnp.ones(120), INTR,
        )
        inl = np.asarray(res.inliers)
        assert not inl[:15].any()
        assert inl[15:].all()


class TestPoseGraph:
    def test_loop_drift_correction(self, rng):
        """Chain of keyframes with accumulated drift; a loop edge back to the
        start must distribute the correction along the chain (the essential
        point of LoopClosing)."""
        K = 20
        # Ground-truth poses: a circle-ish chain of SE3s (scale 1).
        gt = [np.eye(4, dtype=np.float32)]
        step = np.asarray(
            se3.exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, -2 * np.pi / K, 0.0], jnp.float32))
        )
        for i in range(1, K):
            gt.append((step @ gt[-1]).astype(np.float32))
        gt = np.stack(gt)

        # Drifted poses: each relative transform gets a small consistent bias
        # + scale drift, as monocular odometry produces.
        bias = np.asarray(
            sim3.exp(jnp.asarray([0.01, 0.005, 0.0, 0.0, 0.008, 0.0, 0.01], jnp.float32))
        )
        drift = [gt[0].copy()]
        for i in range(1, K):
            rel = gt[i] @ np.linalg.inv(gt[i - 1])
            drift.append((bias @ rel @ drift[-1]).astype(np.float32))
        drift = np.stack(drift)

        # Edges: sequential odometry edges from the DRIFTED estimates (what
        # the map believes) + one loop edge with the TRUE relative transform.
        ei, ej, eS = [], [], []
        for i in range(K - 1):
            ei.append(i)
            ej.append(i + 1)
            eS.append(drift[i + 1] @ np.linalg.inv(drift[i]))
        ei.append(0)
        ej.append(K - 1)
        eS.append(gt[K - 1] @ np.linalg.inv(gt[0]))

        S_opt = optimize_pose_graph(
            jnp.asarray(drift),
            jnp.ones(K, bool),
            jnp.asarray(np.arange(K) == 0),  # fix the first keyframe
            jnp.asarray(np.array(ei, np.int32)),
            jnp.asarray(np.array(ej, np.int32)),
            jnp.asarray(np.stack(eS).astype(np.float32)),
            jnp.ones(len(ei), bool),
            iters=25,
        )
        # End-of-chain error must shrink dramatically.
        end_before = np.abs(drift[K - 1] - gt[K - 1]).max()
        T_opt = np.asarray(jnp.stack([sim3.to_se3(S) for S in S_opt]))
        end_after = np.abs(T_opt[K - 1] - gt[K - 1]).max()
        assert end_after < 0.25 * end_before, (end_before, end_after)
        # Loop edge satisfied.
        rel = np.asarray(S_opt[K - 1]) @ np.linalg.inv(np.asarray(S_opt[0]))
        np.testing.assert_allclose(rel, gt[K - 1] @ np.linalg.inv(gt[0]), atol=0.05)

    def test_fixed_stays(self, rng):
        K = 5
        S = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        for i in range(1, K):
            S[i, 0, 3] = i * 1.0
        ei = np.arange(K - 1, dtype=np.int32)
        ej = ei + 1
        eS = np.stack([S[j] @ np.linalg.inv(S[i]) for i, j in zip(ei, ej)])
        out = optimize_pose_graph(
            jnp.asarray(S), jnp.ones(K, bool),
            jnp.asarray(np.arange(K) == 0),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(eS.astype(np.float32)), jnp.ones(K - 1, bool),
            iters=5,
        )
        np.testing.assert_allclose(np.asarray(out[0]), S[0], atol=1e-5)
        # Consistent graph: nothing should move.
        np.testing.assert_allclose(np.asarray(out), S, atol=1e-3)
