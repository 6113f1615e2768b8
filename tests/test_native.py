"""Native C++ runtime tests: build, vocab fast-load parity, ring buffer
semantics, image conversion parity."""
import threading
import time

import numpy as np
import pytest

from os1_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library could not be built")
    return native.get_lib()


class TestVocabNative:
    def test_matches_python_loader(self, lib, tmp_path, rng):
        from os1_tpu.vocab.train import build_vocabulary
        from os1_tpu.vocab import dbow2

        descs = rng.integers(0, 2**32, size=(2000, 8), dtype=np.uint32)
        v = build_vocabulary(descs, branching=6, depth=3, seed=2)
        path = str(tmp_path / "v.bin")
        dbow2.save_binary(v, path)

        got = native.load_vocab_binary_native(path)
        assert got is not None
        desc, children, weight, word, n_words, kb, L = got
        assert n_words == v.n_words and kb == 6 and L == 3
        np.testing.assert_array_equal(desc, np.asarray(v.node_desc))
        np.testing.assert_array_equal(children, np.asarray(v.node_children))
        np.testing.assert_array_equal(word, np.asarray(v.node_word))
        np.testing.assert_allclose(weight, np.asarray(v.node_weight), rtol=1e-6)

    def test_load_binary_uses_native(self, lib, tmp_path, rng):
        from os1_tpu.vocab.train import build_vocabulary
        from os1_tpu.vocab import dbow2, transform
        import jax.numpy as jnp

        descs = rng.integers(0, 2**32, size=(800, 8), dtype=np.uint32)
        v = build_vocabulary(descs, branching=4, depth=2, seed=3)
        path = str(tmp_path / "v.bin")
        dbow2.save_binary(v, path)
        loaded = dbow2.load_binary(path)
        q = rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32)
        w1, _ = transform(v, jnp.asarray(q), jnp.ones(32, bool))
        w2, _ = transform(loaded, jnp.asarray(q), jnp.ones(32, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


class TestRingBuffer:
    def test_lossless_ordering(self, lib):
        rb = native.NativeRingBuffer(4, (8, 8), realtime=False)
        frames = [np.full((8, 8), i, np.uint8) for i in range(20)]

        def producer():
            for f in frames:
                assert rb.push(f, timeout_ms=2000)
            rb.close()

        t = threading.Thread(target=producer)
        t.start()
        got = []
        while True:
            f = rb.pop(timeout_ms=2000)
            if f is None:
                break
            got.append(int(f[0, 0]))
        t.join()
        assert got == list(range(20))  # lossless: all frames in order

    def test_realtime_drops_oldest(self, lib):
        rb = native.NativeRingBuffer(2, (4, 4), realtime=True)
        for i in range(10):
            assert rb.push(np.full((4, 4), i, np.uint8))
        assert len(rb) == 2
        f = rb.pop()
        assert int(f[0, 0]) == 8  # oldest surviving frame

    def test_pop_timeout(self, lib):
        rb = native.NativeRingBuffer(2, (4, 4))
        t0 = time.time()
        assert rb.pop(timeout_ms=100) is None
        assert 0.05 < time.time() - t0 < 1.0


class TestConversions:
    def test_rgb_to_gray_matches(self, lib, rng):
        rgb = rng.integers(0, 255, (32, 48, 3), np.uint8)
        got = native.rgb_to_gray_native(rgb)
        expected = (
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        ).astype(np.float32)
        np.testing.assert_allclose(got, expected, atol=1e-3)
