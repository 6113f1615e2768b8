"""Camera models: pinhole (radial-tangential, 4/5/8-coefficient) + fisheye
(equidistant projection).

Covers the reference's calibration handling (Tracking::ChangeCalibration,
Tracking.cc:1177-1291: pinhole with k1..k6/p1/p2 auto-shrunk to 4/5/8 coeffs)
and the os1 fisheye extension (Frame::antidistorsionarProyeccionEquidistante,
Frame.cc:355-384, where the undistortion scale is tan(theta_d)/theta_d).

Design: a single ``Camera`` pytree carries an 8-vector of distortion
coefficients ``[k1, k2, p1, p2, k3, k4, k5, k6]`` (unused entries zero) and a
traced ``fisheye`` flag.  Both distortion paths are evaluated branchlessly and
selected with ``where`` — this keeps one compiled program per image geometry
regardless of calibration, which matters because the tracking step is jitted
once and reused for every frame.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsic calibration. All fields are scalars except ``dist`` (8,)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [k1, k2, p1, p2, k3, k4, k5, k6]
    fisheye: jnp.ndarray  # bool scalar: equidistant model if True
    width: jnp.ndarray
    height: jnp.ndarray

    @staticmethod
    def make(fx, fy, cx, cy, dist=None, fisheye=False, width=640, height=480) -> "Camera":
        d = jnp.zeros(8, dtype=jnp.float32)
        if dist is not None:
            dist = jnp.asarray(dist, dtype=jnp.float32)
            d = d.at[: dist.shape[0]].set(dist)
        return Camera(
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32(cx),
            cy=jnp.float32(cy),
            dist=d,
            fisheye=jnp.asarray(fisheye, dtype=bool),
            width=jnp.float32(width),
            height=jnp.float32(height),
        )

    @property
    def K(self) -> jnp.ndarray:
        """3x3 intrinsic matrix (no distortion)."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )


def _distort_pinhole(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Rational radial-tangential model on normalized coords (..., 2).

    x_d = x (1 + k1 r2 + k2 r4 + k3 r6)/(1 + k4 r2 + k5 r4 + k6 r6)
          + tangential(p1, p2).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = [dist[..., i] for i in range(8)]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def _distort_fisheye(xn: jnp.ndarray) -> jnp.ndarray:
    """Equidistant projection: distorted radius = theta (angle from axis).

    Matches the os1 fisheye model where undistortion multiplies by
    tan(theta_d)/theta_d (Frame.cc:374) — i.e. distortion divides by it.
    """
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(x * x + y * y)
    safe_r = jnp.where(r < 1e-8, 1.0, r)
    theta = jnp.arctan(r)
    scale = jnp.where(r < 1e-8, 1.0, theta / safe_r)
    return xn * scale[..., None]


def _undistort_fisheye(xd: jnp.ndarray) -> jnp.ndarray:
    """Inverse equidistant: multiply by tan(theta_d)/theta_d (Frame.cc:374)."""
    x, y = xd[..., 0], xd[..., 1]
    theta_d = jnp.sqrt(x * x + y * y)
    safe = jnp.where(theta_d < 1e-8, 1.0, theta_d)
    # Clamp below pi/2: beyond that the ray leaves the front hemisphere.
    safe = jnp.clip(safe, None, jnp.pi / 2.0 - 1e-3)
    scale = jnp.where(theta_d < 1e-8, 1.0, jnp.tan(safe) / safe)
    return xd * scale[..., None]


def distort(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Normalized undistorted (..., 2) -> normalized distorted (..., 2)."""
    pin = _distort_pinhole(xn, cam.dist)
    fish = _distort_fisheye(xn)
    return jnp.where(cam.fisheye, fish, pin)


def undistort(cam: Camera, xd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Normalized distorted (..., 2) -> undistorted (..., 2).

    Pinhole path inverts the rational model by fixed-point iteration (the
    same scheme as cv::undistortPoints, used by the reference at
    Frame.cc:286-320); fisheye path is closed-form.
    """
    # Fixed-point: x = (xd - tangential(x)) / radial(x), start from xd.
    k1, k2, p1, p2, k3, k4, k5, k6 = [cam.dist[..., i] for i in range(8)]
    x = xd
    for _ in range(iters):
        xi, yi = x[..., 0], x[..., 1]
        r2 = xi * xi + yi * yi
        r4 = r2 * r2
        r6 = r4 * r2
        radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
        dx = 2.0 * p1 * xi * yi + p2 * (r2 + 2.0 * xi * xi)
        dy = p1 * (r2 + 2.0 * yi * yi) + 2.0 * p2 * xi * yi
        x = jnp.stack(
            [
                (xd[..., 0] - dx) / radial,
                (xd[..., 1] - dy) / radial,
            ],
            axis=-1,
        )
    return jnp.where(cam.fisheye, _undistort_fisheye(xd), x)


def project(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points (..., 3) -> distorted pixel coords (..., 2)."""
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    xn = pc[..., :2] / z[..., None]
    xd = distort(cam, xn)
    u = cam.fx * xd[..., 0] + cam.cx
    v = cam.fy * xd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_ideal(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Project WITHOUT distortion — for use with already-undistorted keypoint
    coordinates (the reference stores ``mvKeysUn`` and projects map points
    with the bare K matrix everywhere downstream of Frame construction)."""
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1)


def pixel_to_normalized(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels (..., 2) -> undistorted normalized coords (..., 2)."""
    xd = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    return undistort(cam, xd)


def undistort_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> undistorted pixel coords (reference mvKeysUn)."""
    xn = pixel_to_normalized(cam, uv)
    return jnp.stack(
        [cam.fx * xn[..., 0] + cam.cx, cam.fy * xn[..., 1] + cam.cy], axis=-1
    )


def unproject_ray(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels (..., 2) -> unit ray directions (..., 3) in camera frame."""
    xn = pixel_to_normalized(cam, uv)
    ray = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask of pixels inside the image bounds (minus margin)."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
