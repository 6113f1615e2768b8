"""Optimizer tests: Jacobians vs autodiff, pose optimization convergence with
outliers, Schur BA convergence on synthetic multi-view scenes."""
import numpy as np
import jax
import jax.numpy as jnp

from os1_tpu.geometry import se3
from os1_tpu.optim import reprojection as rp
from os1_tpu.optim import optimize_pose, BAProblem, run_ba

INTR = jnp.asarray([400.0, 400.0, 320.0, 240.0])


def make_scene(rng, n_pts=200, n_cams=5, spread=2.0, depth=6.0):
    pts = rng.uniform(-spread, spread, size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] += depth
    poses = []
    for i in range(n_cams):
        xi = np.concatenate(
            [rng.normal(0, 0.3, 3), rng.normal(0, 0.05, 3)]
        ).astype(np.float32)
        poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    return pts, np.stack(poses)


def project_all(poses, pts):
    uv = []
    for T in poses:
        pc = np.asarray(se3.transform(jnp.asarray(T), jnp.asarray(pts)))
        uv.append(
            np.stack(
                [
                    400.0 * pc[:, 0] / pc[:, 2] + 320.0,
                    400.0 * pc[:, 1] / pc[:, 2] + 240.0,
                ],
                axis=1,
            )
        )
    return np.stack(uv)  # [C, N, 2]


class TestJacobians:
    def test_pose_jacobian_vs_autodiff(self, rng):
        T = np.asarray(se3.exp(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))))
        X = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32) + [0, 0, 5])
        uv = jnp.zeros(2)

        def res_of_xi(xi):
            return rp.residual(se3.exp(xi) @ jnp.asarray(T), X, uv, INTR)

        J_auto = jax.jacfwd(res_of_xi)(jnp.zeros(6))
        J_pose, _ = rp.jacobians(jnp.asarray(T), X, INTR)
        np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_auto), atol=1e-3)

    def test_point_jacobian_vs_autodiff(self, rng):
        T = np.asarray(se3.exp(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))))
        X0 = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32) + [0, 0, 5])
        uv = jnp.zeros(2)
        J_auto = jax.jacfwd(lambda X: rp.residual(jnp.asarray(T), X, uv, INTR))(X0)
        _, J_point = rp.jacobians(jnp.asarray(T), X0, INTR)
        np.testing.assert_allclose(np.asarray(J_point), np.asarray(J_auto), atol=1e-3)


class TestPoseOpt:
    def test_recovers_pose(self, rng):
        pts, poses = make_scene(rng, n_cams=1)
        T_true = poses[0]
        uv = project_all([T_true], pts)[0]
        # Perturb the pose.
        T0 = np.asarray(
            se3.exp(jnp.asarray([0.1, -0.08, 0.05, 0.02, -0.03, 0.01], jnp.float32))
        ) @ T_true
        res = optimize_pose(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts)), jnp.ones(len(pts), bool), INTR,
        )
        err = np.abs(np.asarray(res.Tcw) - T_true).max()
        assert err < 1e-3, err
        assert int(res.n_inliers) == len(pts)

    def test_outliers_rejected(self, rng):
        pts, poses = make_scene(rng, n_pts=300, n_cams=1)
        T_true = poses[0]
        uv = project_all([T_true], pts)[0]
        bad = rng.choice(300, 60, replace=False)
        uv[bad] += rng.uniform(30, 120, size=(60, 2)) * np.sign(rng.normal(size=(60, 2)))
        T0 = np.asarray(
            se3.exp(jnp.asarray([0.05, 0.05, -0.05, 0.01, 0.02, -0.01], jnp.float32))
        ) @ T_true
        res = optimize_pose(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(300), jnp.ones(300, bool), INTR,
        )
        err = np.abs(np.asarray(res.Tcw) - T_true).max()
        assert err < 2e-3, err
        inl = np.asarray(res.inlier)
        assert inl[bad].sum() <= 3
        assert inl.sum() >= 230

    def test_garbage_invalid_lanes_no_nan(self, rng):
        pts, poses = make_scene(rng, n_pts=100, n_cams=1)
        T_true = poses[0]
        uv = project_all([T_true], pts)[0]
        pts_g = pts.copy()
        pts_g[50:] = 0.0  # at camera center -> z ~ 0 garbage
        valid = np.zeros(100, bool)
        valid[:50] = True
        res = optimize_pose(
            jnp.asarray(T_true), jnp.asarray(pts_g), jnp.asarray(uv),
            jnp.ones(100), jnp.asarray(valid), INTR,
        )
        assert np.isfinite(np.asarray(res.Tcw)).all()
        assert int(res.n_inliers) == 50


def build_ba_problem(pts, poses, uv, noise_uv, fixed_mask, rng, max_obs=None):
    """All cameras observe all points (dense synthetic case)."""
    C, N = uv.shape[0], pts.shape[0]
    O = C if max_obs is None else max_obs
    obs_cam = np.tile(np.arange(C, dtype=np.int32), (N, 1))[:, :O]
    obs_uv = noise_uv.transpose(1, 0, 2)[:, :O]  # [N, O, 2]
    return BAProblem(
        cam_T=jnp.asarray(poses),
        cam_fixed=jnp.asarray(fixed_mask),
        points=jnp.asarray(pts),
        point_valid=jnp.ones(N, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_sigma2=jnp.ones((N, O)),
        obs_valid=jnp.ones((N, O), bool),
        intr=INTR,
    )


class TestBA:
    def test_converges_from_noisy_init(self, rng):
        pts, poses = make_scene(rng, n_pts=150, n_cams=6)
        uv = project_all(poses, pts)
        # Noise the geometry: perturb points and all but the first two poses.
        pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
        poses0 = poses.copy()
        for i in range(2, 6):
            poses0[i] = (
                np.asarray(
                    se3.exp(jnp.asarray(np.concatenate([
                        rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)
                    ]).astype(np.float32)))
                )
                @ poses0[i]
            )
        fixed = np.zeros(6, bool)
        fixed[:2] = True  # gauge
        prob = build_ba_problem(pts0, poses0, uv, uv, fixed, rng)
        res = run_ba(prob, iters=12)
        # Poses recovered.
        for i in range(2, 6):
            err = np.abs(np.asarray(res.cam_T[i]) - poses[i]).max()
            assert err < 5e-3, (i, err)
        perr = np.abs(np.asarray(res.points) - pts).max()
        assert perr < 2e-2, perr
        assert bool(np.asarray(res.obs_inlier).all())

    def test_fixed_cameras_not_moved(self, rng):
        pts, poses = make_scene(rng, n_pts=100, n_cams=4)
        uv = project_all(poses, pts)
        fixed = np.array([True, False, False, False])
        prob = build_ba_problem(
            pts + rng.normal(0, 0.03, pts.shape).astype(np.float32),
            poses, uv, uv, fixed, rng,
        )
        res = run_ba(prob, iters=5)
        np.testing.assert_array_equal(np.asarray(res.cam_T[0]), poses[0])

    def test_outlier_reclassification(self, rng):
        pts, poses = make_scene(rng, n_pts=120, n_cams=4)
        uv = project_all(poses, pts)
        noisy = uv.copy()
        noisy[2, :20] += 80.0  # corrupted measurements in camera 2
        fixed = np.array([True, True, False, False])
        prob = build_ba_problem(pts, poses, uv, noisy, fixed, rng)
        res = run_ba(prob, iters=5, reclassify_and_continue=5)
        inl = np.asarray(res.obs_inlier)
        assert not inl[:20, 2].any()
        assert inl[20:, :].mean() > 0.95
        # Camera 3 should still be accurate despite camera-2 corruption.
        err = np.abs(np.asarray(res.cam_T[3]) - poses[3]).max()
        assert err < 5e-3, err

    def test_masked_point_slots_stay_put(self, rng):
        pts, poses = make_scene(rng, n_pts=50, n_cams=3)
        uv = project_all(poses, pts)
        prob = build_ba_problem(pts, poses, uv, uv, np.array([True, True, False]), rng)
        pv = np.ones(50, bool)
        pv[30:] = False
        prob = prob._replace(
            point_valid=jnp.asarray(pv),
            obs_valid=prob.obs_valid & jnp.asarray(pv)[:, None],
        )
        res = run_ba(prob, iters=3)
        np.testing.assert_array_equal(np.asarray(res.points[30:]), pts[30:])
        assert np.isfinite(np.asarray(res.cam_T)).all()
