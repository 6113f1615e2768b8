"""Property tests for the geometry core: SE3/Sim3 exp/log round-trips,
camera distortion inverses, DLT triangulation accuracy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from os1_tpu.geometry import camera, se3, sim3, triangulation


def random_se3(rng, n=16, rot_scale=1.0, t_scale=2.0):
    xi = np.concatenate(
        [
            rng.normal(size=(n, 3)) * t_scale,
            rng.normal(size=(n, 3)) * rot_scale,
        ],
        axis=1,
    ).astype(np.float32)
    return se3.exp_batch(jnp.asarray(xi))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [rng.normal(size=(32, 3)), rng.uniform(-2.5, 2.5, size=(32, 3))], axis=1
        ).astype(np.float32)
        T = se3.exp_batch(jnp.asarray(xi))
        xi2 = se3.log_batch(T)
        T2 = se3.exp_batch(xi2)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([[1e-9, 2e-9, -1e-9, 1e-10, -1e-10, 1e-10]], dtype=jnp.float32)
        T = se3.exp_batch(xi)
        assert np.isfinite(np.asarray(T)).all()
        np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)

    def test_inverse(self, rng):
        T = random_se3(rng)
        I = T @ se3.inverse(T)
        np.testing.assert_allclose(
            np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-5
        )

    def test_rotation_orthonormal(self, rng):
        T = random_se3(rng)
        R = np.asarray(T[:, :3, :3])
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_transform_points(self, rng):
        T = random_se3(rng, n=4)
        pts = jnp.asarray(rng.normal(size=(4, 10, 3)).astype(np.float32))
        out = se3.transform(T, pts)
        R = np.asarray(T[:, :3, :3])
        t = np.asarray(T[:, :3, 3])
        expected = np.einsum("bij,bnj->bni", R, np.asarray(pts)) + t[:, None, :]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_quaternion_roundtrip(self, rng):
        T = random_se3(rng, n=64, rot_scale=1.5)
        R = T[:, :3, :3]
        q = se3.to_quaternion(R)
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_log_near_pi(self):
        # Rotation by almost pi about a skew axis.
        axis = np.array([1.0, 2.0, -0.5])
        axis = axis / np.linalg.norm(axis)
        phi = (np.pi - 1e-3) * axis
        R = se3.so3_exp(jnp.asarray(phi, dtype=jnp.float32))
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), phi, atol=1e-2)

    def test_camera_center(self, rng):
        T = random_se3(rng, n=8)
        Ow = se3.camera_center(T)
        # Transforming the center into camera frame gives the origin.
        pc = se3.transform(T, Ow)
        np.testing.assert_allclose(np.asarray(pc), 0.0, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [
                rng.normal(size=(32, 3)),
                rng.uniform(-2.0, 2.0, size=(32, 3)),
                rng.uniform(-0.7, 0.7, size=(32, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        S = sim3.exp_batch(jnp.asarray(xi))
        xi2 = sim3.log_batch(S)
        S2 = sim3.exp_batch(xi2)
        np.testing.assert_allclose(np.asarray(S), np.asarray(S2), atol=3e-4)

    def test_identity(self):
        S = sim3.exp(jnp.zeros(7, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(S), np.eye(4), atol=1e-6)

    def test_scale_recovery(self, rng):
        xi = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3, 0.5], dtype=jnp.float32)
        S = sim3.exp(xi)
        _, _, s = sim3.to_Rts(S)
        np.testing.assert_allclose(float(s), np.exp(0.5), rtol=1e-5)

    def test_inverse(self, rng):
        xi = jnp.asarray(
            np.concatenate(
                [
                    rng.normal(size=(8, 3)),
                    rng.uniform(-1, 1, size=(8, 3)),
                    rng.uniform(-0.5, 0.5, size=(8, 1)),
                ],
                axis=1,
            ).astype(np.float32)
        )
        S = sim3.exp_batch(xi)
        I = S @ sim3.inverse(S)
        np.testing.assert_allclose(
            np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-4
        )

    def test_to_se3_divides_translation(self):
        S = sim3.from_Rts(jnp.eye(3), jnp.array([2.0, 0.0, 0.0]), jnp.asarray(2.0))
        T = sim3.to_se3(S)
        np.testing.assert_allclose(np.asarray(T[:3, 3]), [1.0, 0.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-5)


class TestCamera:
    def _cam(self, fisheye=False):
        return camera.Camera.make(
            fx=458.0, fy=457.0, cx=320.0, cy=240.0,
            dist=[-0.28, 0.07, 1e-4, -2e-5, 0.0] if not fisheye else None,
            fisheye=fisheye,
        )

    def test_distort_undistort_roundtrip_pinhole(self, rng):
        cam = self._cam()
        xn = jnp.asarray(rng.uniform(-0.5, 0.5, size=(100, 2)).astype(np.float32))
        xd = camera.distort(cam, xn)
        xu = camera.undistort(cam, xd)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)

    def test_distort_undistort_roundtrip_fisheye(self, rng):
        cam = self._cam(fisheye=True)
        xn = jnp.asarray(rng.uniform(-0.8, 0.8, size=(100, 2)).astype(np.float32))
        xd = camera.distort(cam, xn)
        xu = camera.undistort(cam, xd)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)

    def test_matches_opencv_pinhole(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = self._cam()
        pts3d = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        pts3d[:, 2] += 3.0
        K = np.array([[458.0, 0, 320.0], [0, 457.0, 240.0], [0, 0, 1]])
        d = np.array([-0.28, 0.07, 1e-4, -2e-5, 0.0])
        expected, _ = cv2.projectPoints(
            pts3d, np.zeros(3), np.zeros(3), K, d
        )
        got = camera.project(cam, jnp.asarray(pts3d))
        np.testing.assert_allclose(np.asarray(got), expected[:, 0, :], atol=0.05)

    def test_matches_opencv_fisheye(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = self._cam(fisheye=True)
        pts3d = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        pts3d[:, 2] += 3.0
        K = np.array([[458.0, 0, 320.0], [0, 457.0, 240.0], [0, 0, 1]])
        expected, _ = cv2.fisheye.projectPoints(
            pts3d[:, None, :].astype(np.float64),
            np.zeros(3), np.zeros(3), K, np.zeros(4),
        )
        got = camera.project(cam, jnp.asarray(pts3d))
        np.testing.assert_allclose(np.asarray(got), expected[:, 0, :], atol=0.05)

    def test_unproject_project_roundtrip(self, rng):
        cam = self._cam()
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(50, 590, size=64), rng.uniform(50, 430, size=64)], axis=1
            ).astype(np.float32)
        )
        rays = camera.unproject_ray(cam, uv)
        # Scale rays to arbitrary depth and project back.
        pts = rays * 4.0
        uv2 = camera.project(cam, pts)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=0.02)


class TestTriangulation:
    def test_dlt_exact(self, rng):
        # Two cameras looking at points; normalized coordinates (P = [R|t]).
        n = 64
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        pts[:, 2] += 5.0
        T1 = np.eye(4, dtype=np.float32)
        xi = np.array([0.5, 0.05, -0.02, 0.02, -0.3, 0.01], dtype=np.float32)
        T2 = np.asarray(se3.exp(jnp.asarray(xi)))
        P1 = T1[:3, :]
        P2 = T2[:3, :]

        def proj(P, X):
            Xh = np.concatenate([X, np.ones((n, 1), np.float32)], axis=1)
            x = (P @ Xh.T).T
            return x[:, :2] / x[:, 2:3]

        x1 = proj(P1, pts)
        x2 = proj(P2, pts)
        got = triangulation.triangulate_dlt(
            jnp.asarray(np.broadcast_to(P1, (n, 3, 4))),
            jnp.asarray(np.broadcast_to(P2, (n, 3, 4))),
            jnp.asarray(x1),
            jnp.asarray(x2),
        )
        np.testing.assert_allclose(np.asarray(got), pts, atol=2e-2)

    def test_validate_rejects_behind_camera(self):
        T1 = jnp.eye(4)
        T2 = se3.exp(jnp.array([0.5, 0, 0, 0, 0, 0], dtype=jnp.float32))
        xw = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]])
        cam = camera.Camera.make(fx=400.0, fy=400.0, cx=320.0, cy=240.0)
        uv1 = camera.project_ideal(cam, se3.transform(T1, xw))
        uv2 = camera.project_ideal(cam, se3.transform(T2, xw))
        res = triangulation.validate(
            T1, T2, xw, uv1, uv2,
            lambda pc: camera.project_ideal(cam, pc),
            lambda pc: camera.project_ideal(cam, pc),
            jnp.ones(2), jnp.ones(2),
        )
        assert not bool(res.valid[0])
        assert bool(res.valid[1])

    def test_median_depth(self):
        T = jnp.eye(4)
        pts = jnp.array([[0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0], [0, 0, 100.0]])
        mask = jnp.array([True, True, True, False])
        md = triangulation.median_depth(T, pts, mask)
        assert float(md) == 2.0
