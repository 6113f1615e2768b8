"""Native (C++) host-runtime bindings: built on demand with g++, loaded via
ctypes, with pure-Python fallbacks everywhere (``available()`` reports
whether the native path is active).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "os1native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libos1native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.vocab_count.restype = ctypes.c_int64
        lib.vocab_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vocab_load.restype = ctypes.c_int64
        lib.vocab_load.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.bow_transform.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.vocab_train.restype = ctypes.c_int64
        lib.vocab_train.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_close.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.ring_pop.restype = ctypes.c_int
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.ring_size.restype = ctypes.c_int64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.rgb_u8_to_gray_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
        ]
        lib.point_distinctive_desc.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------------- #
def load_vocab_binary_native(path: str):
    """Fast-path DBoW2 binary vocabulary load. Returns the same tuple shape
    the Python reader produces, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    k = ctypes.c_int32()
    L = ctypes.c_int32()
    n_nodes = lib.vocab_count(path.encode(), ctypes.byref(k), ctypes.byref(L))
    if n_nodes <= 0:
        return None
    kb = int(k.value)
    desc = np.zeros((n_nodes, 8), np.uint32)
    children = np.zeros((n_nodes, kb), np.int32)
    weight = np.zeros(n_nodes, np.float32)
    word = np.zeros(n_nodes, np.int32)
    n_words = lib.vocab_load(
        path.encode(),
        desc.ctypes.data_as(ctypes.c_void_p),
        children.ctypes.data_as(ctypes.c_void_p),
        weight.ctypes.data_as(ctypes.c_void_p),
        word.ctypes.data_as(ctypes.c_void_p),
        n_nodes, kb,
    )
    if n_words < 0:
        return None
    return desc, children, weight, word, int(n_words), kb, int(L.value)


def bow_transform_native(desc, valid, node_desc, node_children, node_weight,
                         node_word, kb: int, depth: int):
    """Vocabulary-tree descent on the host (TemplatedVocabulary::transform).
    desc [N, 8] uint32, valid [N] bool; tree arrays as produced by the
    loader/trainer. Returns (word [N] int32, weight [N] float32) or None if
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    desc = np.ascontiguousarray(desc, np.uint32)
    valid = np.ascontiguousarray(valid, np.uint8)
    node_desc = np.ascontiguousarray(node_desc, np.uint32)
    node_children = np.ascontiguousarray(node_children, np.int32)
    node_weight = np.ascontiguousarray(node_weight, np.float32)
    node_word = np.ascontiguousarray(node_word, np.int32)
    n = len(desc)
    out_word = np.empty(n, np.int32)
    out_weight = np.empty(n, np.float32)
    p = ctypes.c_void_p
    lib.bow_transform(
        desc.ctypes.data_as(p), valid.ctypes.data_as(p), n,
        node_desc.ctypes.data_as(p), node_children.ctypes.data_as(p),
        node_weight.ctypes.data_as(p), node_word.ctypes.data_as(p),
        kb, depth,
        out_word.ctypes.data_as(p), out_weight.ctypes.data_as(p),
    )
    return out_word, out_weight


def vocab_train_native(descs, branching: int, depth: int, seed: int = 0,
                       iters: int = 8):
    """Hierarchical binary k-medians training in C++ (the DBoW2
    construction). Returns (node_desc, children, node_word, leaf_count,
    n_nodes, n_words) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    descs = np.ascontiguousarray(descs, np.uint32)
    m = len(descs)
    max_nodes = sum(branching**l for l in range(depth + 1)) + 1
    node_desc = np.zeros((max_nodes, 8), np.uint32)
    children = np.zeros((max_nodes, branching), np.int32)
    node_word = np.zeros(max_nodes, np.int32)
    leaf_count = np.zeros(max_nodes, np.int32)
    p = ctypes.c_void_p
    n_nodes = lib.vocab_train(
        descs.ctypes.data_as(p), m, branching, depth,
        ctypes.c_uint32(seed), iters,
        node_desc.ctypes.data_as(p), children.ctypes.data_as(p),
        node_word.ctypes.data_as(p), leaf_count.ctypes.data_as(p),
        max_nodes,
    )
    if n_nodes <= 0:
        return None
    n_nodes = int(n_nodes)
    n_words = int((node_word[:n_nodes] >= 0).sum())
    return (node_desc[:n_nodes], children[:n_nodes], node_word[:n_nodes],
            leaf_count[:n_nodes], n_nodes, n_words)


def point_distinctive_desc_native(descs: np.ndarray, live: np.ndarray):
    """Distinctive-descriptor slot per point (min median Hamming among live
    observations — MapPoint::ComputeDistinctiveDescriptors,
    MapPoint.cc:227-293). descs [n, M, 8] uint32, live [n, M] bool.
    Returns best live slot per point [n] int32 (-1 if no live slot), or None
    if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    descs = np.ascontiguousarray(descs, np.uint32)
    live_u8 = np.ascontiguousarray(live, np.uint8)
    n, M = live_u8.shape
    out = np.empty(n, np.int32)
    p = ctypes.c_void_p
    lib.point_distinctive_desc(
        descs.ctypes.data_as(p), live_u8.ctypes.data_as(p), n, M,
        out.ctypes.data_as(p),
    )
    return out


class NativeRingBuffer:
    """SPSC frame ring buffer (the Video-thread frame mailbox in C++)."""

    def __init__(self, capacity: int, frame_shape, dtype=np.uint8,
                 realtime: bool = False):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.slot_bytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        self._h = lib.ring_create(capacity, self.slot_bytes, int(realtime))

    def push(self, frame: np.ndarray, timeout_ms: int = 1000) -> bool:
        frame = np.ascontiguousarray(frame, dtype=self.dtype)
        assert frame.nbytes == self.slot_bytes
        return bool(
            self._lib.ring_push(
                self._h, frame.ctypes.data_as(ctypes.c_void_p), timeout_ms
            )
        )

    def pop(self, timeout_ms: int = 1000):
        out = np.empty(self.frame_shape, self.dtype)
        ok = self._lib.ring_pop(
            self._h, out.ctypes.data_as(ctypes.c_void_p), timeout_ms
        )
        return out if ok else None

    def __len__(self):
        return int(self._lib.ring_size(self._h))

    def close(self):
        self._lib.ring_close(self._h)

    def __del__(self):
        try:
            self._lib.ring_destroy(self._h)
        except Exception:
            pass


def rgb_to_gray_native(rgb: np.ndarray):
    """BT.601 RGB->gray in C++; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((h, w), np.float32)
    lib.rgb_u8_to_gray_f32(
        rgb.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        h * w,
    )
    return out
