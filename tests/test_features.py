"""Feature-engine tests: FAST vs OpenCV golden corners, descriptor rotation
invariance, Hamming kernel equivalence, spatial balancing contract."""
import numpy as np
import pytest
import jax.numpy as jnp

from os1_tpu.ops import fast, hamming, image, topk
from os1_tpu.features import OrbConfig, make_extractor


def synthetic_corners_image(h=240, w=320, n=40, seed=3):
    """Random bright rectangles on dark background: unambiguous corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 30.0, np.float32)
    for _ in range(n):
        y, x = rng.integers(20, h - 40), rng.integers(20, w - 40)
        hh, ww = rng.integers(8, 25, size=2)
        img[y : y + hh, x : x + ww] = rng.uniform(120, 250)
    return img


def textured_image(h=480, w=640, seed=0):
    """Smoothly varying texture with plenty of gradient structure."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    import cv2

    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255)


class TestHamming:
    def test_pack_unpack_roundtrip(self, rng):
        bits = rng.integers(0, 2, size=(16, 256)).astype(bool)
        packed = hamming.pack_bits(jnp.asarray(bits))
        assert packed.shape == (16, 8) and packed.dtype == jnp.uint32
        back = hamming.unpack_bits(packed)
        np.testing.assert_array_equal(np.asarray(back), bits)

    def test_matrix_matches_numpy(self, rng):
        a = rng.integers(0, 2, size=(32, 256)).astype(bool)
        b = rng.integers(0, 2, size=(48, 256)).astype(bool)
        expected = (a[:, None, :] != b[None, :, :]).sum(-1)
        pa, pb = hamming.pack_bits(jnp.asarray(a)), hamming.pack_bits(jnp.asarray(b))
        np.testing.assert_array_equal(np.asarray(hamming.hamming_matrix(pa, pb)), expected)
        np.testing.assert_array_equal(
            np.asarray(hamming.hamming_matrix_mxu(pa, pb)), expected
        )

    def test_pairwise(self, rng):
        a = rng.integers(0, 2, size=(20, 256)).astype(bool)
        b = rng.integers(0, 2, size=(20, 256)).astype(bool)
        expected = (a != b).sum(-1)
        d = hamming.hamming_pairwise(
            hamming.pack_bits(jnp.asarray(a)), hamming.pack_bits(jnp.asarray(b))
        )
        np.testing.assert_array_equal(np.asarray(d), expected)


class TestFast:
    def test_detects_rectangle_corners(self):
        img = np.full((64, 64), 20.0, np.float32)
        img[20:40, 20:44] = 200.0
        scores = np.asarray(fast.nms3x3(fast.fast_scores(jnp.asarray(img), 20.0)))
        ys, xs = np.nonzero(scores)
        found = set(zip(ys.tolist(), xs.tolist()))
        # Each of the 4 rectangle corners should have a detection within 2px.
        for cy, cx in [(20, 20), (20, 43), (39, 20), (39, 43)]:
            assert any(abs(y - cy) <= 2 and abs(x - cx) <= 2 for y, x in found), (
                cy, cx, found,
            )

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 77.0)
        scores = np.asarray(fast.fast_scores(img, 10.0))
        assert (scores == 0).all()

    def test_agrees_with_opencv(self):
        cv2 = pytest.importorskip("cv2")
        img = textured_image(240, 320)
        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16,
        )
        cv_kps = det.detect(img.astype(np.uint8))
        cv_pts = np.array([k.pt for k in cv_kps])  # (x, y)
        scores = np.asarray(fast.nms3x3(fast.fast_scores(jnp.asarray(img), 20.0)))
        ys, xs = np.nonzero(scores)
        ours = np.stack([xs, ys], axis=1)
        assert len(cv_pts) > 20
        # Every OpenCV corner (away from the border) has one of ours within 2px.
        inner = cv_pts[
            (cv_pts[:, 0] > 5) & (cv_pts[:, 0] < 315)
            & (cv_pts[:, 1] > 5) & (cv_pts[:, 1] < 235)
        ]
        d = np.abs(inner[:, None, :] - ours[None, :, :]).max(-1).min(1)
        assert (d <= 2).mean() > 0.9, f"only {(d <= 2).mean():.2f} recovered"


class TestTopk:
    def test_rank_major_balance(self):
        # Two clusters: one cell with 3 strong corners, another with 1 weak.
        scores = np.zeros((64, 64), np.float32)
        scores[4, 4] = 100.0
        scores[5, 10] = 90.0
        scores[10, 5] = 80.0
        scores[40, 40] = 5.0  # weak but alone in its cell
        xy, s, valid = topk.balanced_cell_topk(jnp.asarray(scores), 16, 4, 3)
        got = {tuple(map(int, p)) for p, v in zip(np.asarray(xy), np.asarray(valid)) if v}
        # The weak-but-isolated corner must be selected before the strong
        # cell's second-best (spatial balance property).
        assert (40, 40) in got
        assert (4, 4) in got

    def test_padding_invalid(self):
        scores = np.zeros((32, 32), np.float32)
        scores[8, 8] = 1.0
        xy, s, valid = topk.balanced_cell_topk(jnp.asarray(scores), 16, 4, 10)
        assert int(np.asarray(valid).sum()) == 1


class TestOrbExtractor:
    def test_extract_shapes_and_validity(self):
        cfg = OrbConfig(height=240, width=320, n_features=512, n_levels=4)
        extract = make_extractor(cfg)
        img = textured_image(240, 320)
        feats = extract(jnp.asarray(img))
        assert feats.xy.shape == (512, 2)
        assert feats.desc.shape == (512, 8)
        assert int(np.asarray(feats.valid).sum()) > 200
        xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
        # Multiple octaves populated.
        assert len(np.unique(np.asarray(feats.octave)[np.asarray(feats.valid)])) >= 2

    def test_descriptor_rotation_invariance(self):
        """Rotate the image 20 degrees; descriptors of the same physical
        corners should match with small Hamming distance."""
        cv2 = pytest.importorskip("cv2")
        img = synthetic_corners_image(h=320, w=320, n=60, seed=5)
        angle_deg = 20.0
        M = cv2.getRotationMatrix2D((160, 160), angle_deg, 1.0)
        rot = cv2.warpAffine(img, M, (320, 320), flags=cv2.INTER_LINEAR,
                             borderValue=30.0)
        cfg = OrbConfig(height=320, width=320, n_features=512, n_levels=1)
        extract = make_extractor(cfg)
        f1 = extract(jnp.asarray(img))
        f2 = extract(jnp.asarray(rot))
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        xy1 = np.asarray(f1.xy)[v1]
        xy2 = np.asarray(f2.xy)[v2]
        d1 = np.asarray(f1.desc)[v1]
        d2 = np.asarray(f2.desc)[v2]
        # Ground-truth correspondence: rotate xy1 by M, find nearest xy2.
        ones = np.ones((len(xy1), 1))
        xy1r = (np.hstack([xy1, ones]) @ M.T)
        dists = np.linalg.norm(xy1r[:, None, :] - xy2[None, :, :], axis=-1)
        nn = dists.argmin(1)
        geom_ok = dists[np.arange(len(xy1)), nn] < 2.0
        assert geom_ok.sum() > 30
        hd = np.asarray(
            hamming.hamming_pairwise(jnp.asarray(d1[geom_ok]), jnp.asarray(d2[nn[geom_ok]]))
        )
        # Matched physical corners: median Hamming distance well under random
        # (random 256-bit pairs average 128).
        assert np.median(hd) < 60, f"median hamming {np.median(hd)}"

    def test_deterministic(self):
        cfg = OrbConfig(height=120, width=160, n_features=128, n_levels=2)
        extract = make_extractor(cfg)
        img = jnp.asarray(textured_image(120, 160))
        f1 = extract(img)
        f2 = extract(img)
        np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))


class TestImageOps:
    def test_gaussian_blur_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        img = textured_image(64, 64)
        ours = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
        ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REPLICATE)
        np.testing.assert_allclose(ours, ref, atol=0.25)

    def test_extract_patches(self):
        img = jnp.arange(100.0).reshape(10, 10)
        p = image.extract_patches(img, jnp.array([[5.0, 5.0]]), 3)
        np.testing.assert_array_equal(
            np.asarray(p[0]), np.asarray(img[4:7, 4:7])
        )

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(16.0).reshape(4, 4))
        v = image.bilinear_sample(img, jnp.array([[1.5, 1.5]]))
        assert abs(float(v[0]) - (5 + 6 + 9 + 10) / 4) < 1e-5
