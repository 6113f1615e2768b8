"""Two-view initializer tests on synthetic scenes: general motion (F path),
planar scene (H path), outlier robustness, pure-rotation rejection."""
import numpy as np
import jax
import jax.numpy as jnp

from os1_tpu.geometry import se3
from os1_tpu.solvers import initialize_two_view

K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]], np.float32)


def project(T, pts):
    pc = np.asarray(se3.transform(jnp.asarray(T), jnp.asarray(pts)))
    uv = pc[:, :2] / pc[:, 2:3]
    return uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def make_scene(rng, n=300, planar=False, xi=(0.6, 0.05, 0.02, 0.02, -0.1, 0.01)):
    pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    if planar:
        pts[:, 2] = 0.3 * pts[:, 0] - 0.2 * pts[:, 1]  # a tilted plane
    pts[:, 2] += 6.0
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.exp(jnp.asarray(xi, dtype=jnp.float32)))
    uv1 = project(T1, pts)
    uv2 = project(T2, pts)
    noise = rng.normal(0, 0.4, size=uv1.shape).astype(np.float32)
    return pts, T2, uv1 + noise, project(T2, pts) + noise


def check_pose(T21_est, T2_true, atol_rot=0.03, atol_dir=0.05):
    """Compare up to monocular scale: rotation + translation direction."""
    R_est = np.asarray(T21_est)[:3, :3]
    R_true = T2_true[:3, :3]
    dR = R_est @ R_true.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    t_est = np.asarray(T21_est)[:3, 3]
    t_true = T2_true[:3, 3]
    dirdot = abs(
        np.dot(t_est / np.linalg.norm(t_est), t_true / np.linalg.norm(t_true))
    )
    assert ang < atol_rot, f"rotation error {ang}"
    assert dirdot > 1 - atol_dir, f"translation direction dot {dirdot}"


class TestInitializer:
    def test_general_scene_uses_f(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng)
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.asarray(K), jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert not bool(res.used_homography)
        check_pose(res.T21, T2)
        assert int(res.n_good) > 200
        # Triangulated points match ground truth up to scale.
        good = np.asarray(res.good)
        X = np.asarray(res.points)[good]
        gt = pts[good]
        scale = np.median(np.linalg.norm(X, axis=1) / np.linalg.norm(gt, axis=1))
        np.testing.assert_allclose(X / scale, gt, atol=0.35)

    def test_planar_scene_uses_h(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng, planar=True)
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.asarray(K), jax.random.PRNGKey(1),
        )
        assert bool(res.used_homography)
        assert bool(res.success)
        check_pose(res.T21, T2, atol_rot=0.05)

    def test_outlier_robustness(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng, n=400)
        # Corrupt 30% of matches.
        n_bad = 120
        bad = rng.choice(len(uv1), n_bad, replace=False)
        uv2c = uv2.copy()
        uv2c[bad] = rng.uniform([0, 0], [640, 480], size=(n_bad, 2))
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2c), jnp.ones(len(uv1), bool),
            jnp.asarray(K), jax.random.PRNGKey(2),
        )
        assert bool(res.success)
        check_pose(res.T21, T2)
        # Most outliers rejected.
        good = np.asarray(res.good)
        assert good[bad].mean() < 0.1

    def test_pure_rotation_rejected(self, rng):
        """No parallax -> must not initialize (reference's minParallax gate)."""
        pts, T2, uv1, uv2 = make_scene(rng, xi=(0.0, 0.0, 0.0, 0.02, -0.1, 0.01))
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.asarray(K), jax.random.PRNGKey(3),
        )
        assert not bool(res.success)

    def test_too_few_matches_rejected(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng, n=60)
        valid = np.zeros(60, bool)
        valid[:30] = True  # below min_triangulated=50
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(4),
        )
        assert not bool(res.success)

    def test_respects_valid_mask(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng, n=300)
        # Invalid entries carry garbage; must not affect the result.
        valid = np.ones(300, bool)
        valid[250:] = False
        uv2g = uv2.copy()
        uv2g[250:] = 1e6
        res = initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2g), jnp.asarray(valid),
            jnp.asarray(K), jax.random.PRNGKey(5),
        )
        assert bool(res.success)
        check_pose(res.T21, T2)
        assert not np.asarray(res.good)[250:].any()

    def test_deterministic(self, rng):
        pts, T2, uv1, uv2 = make_scene(rng)
        args = (
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.asarray(K), jax.random.PRNGKey(0),
        )
        r1 = initialize_two_view(*args)
        r2 = initialize_two_view(*args)
        np.testing.assert_array_equal(np.asarray(r1.T21), np.asarray(r2.T21))
