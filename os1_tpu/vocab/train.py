"""Vocabulary training: hierarchical binary k-medians over ORB descriptors.

The reference ships a pre-trained 10^6-word vocabulary blob (orbVoc.bin,
stripped from the repo); this module builds one from training descriptors —
the same hierarchical-k-means construction DBoW2 uses (k-medians with
bitwise-majority centroids, the correct mean under Hamming distance).
Deterministic under a fixed seed.
"""
from __future__ import annotations

import numpy as np

from .tree import Vocabulary


def _unpack(descs: np.ndarray) -> np.ndarray:
    """[M, 8] uint32 -> [M, 256] uint8 bits."""
    return np.unpackbits(
        descs.view(np.uint8).reshape(len(descs), 32), axis=-1, bitorder="little"
    )


def _pack(bits: np.ndarray) -> np.ndarray:
    """[M, 256] bits -> [M, 8] uint32."""
    by = np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")
    return by.reshape(len(bits), 8, 4).view(np.uint32).reshape(len(bits), 8)


def _assign(bits: np.ndarray, centers: np.ndarray, chunk: int = 131072) -> np.ndarray:
    """Nearest-centroid assignment under Hamming distance via the popcount
    identity |a ^ c| = |a| + |c| - 2 a.c on 0/1 floats — a BLAS matmul
    instead of an [M, k, 256] byte-compare broadcast (the broadcast needs
    ~3 GB and ~50x the time at vocabulary-training scale, M ~ 10^6)."""
    cf = centers.astype(np.float32)
    ones_c = cf.sum(1)
    out = np.empty(len(bits), np.int64)
    for lo in range(0, len(bits), chunk):
        bf = bits[lo : lo + chunk].astype(np.float32)
        d = ones_c[None, :] - 2.0 * (bf @ cf.T)  # + |a| is constant per row
        out[lo : lo + chunk] = d.argmin(1)
    return out


def _kmedians(bits: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians: returns (centroid bits [k', 256], assignment [M]).
    k' <= k (empty clusters dropped)."""
    m = len(bits)
    k = min(k, m)
    centers = bits[rng.choice(m, size=k, replace=False)].astype(np.uint8)
    assign = np.zeros(m, np.int64)
    for _ in range(iters):
        assign = _assign(bits, centers)
        new = []
        for c in range(len(centers)):
            sel = bits[assign == c]
            if len(sel) == 0:
                continue
            new.append((sel.mean(0) >= 0.5).astype(np.uint8))
        centers = np.array(new, np.uint8)
        if len(centers) <= 1:
            break
    assign = _assign(bits, centers)
    return centers, assign


def build_vocabulary(
    descs: np.ndarray, branching: int = 10, depth: int = 4, seed: int = 0,
    n_docs: int | None = None, doc_ids: np.ndarray | None = None,
) -> Vocabulary:
    """Train a (branching^depth)-word vocabulary from packed descriptors
    [M, 8] uint32. doc_ids (e.g. source-image index per descriptor) drive
    tf-idf weights; without them weights fall back to idf over descriptors.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    bits = _unpack(np.asarray(descs, np.uint32))

    node_desc = [np.zeros(8, np.uint32)]  # root placeholder
    node_children = [[]]
    node_parent = [-1]
    node_is_leaf = [False]
    node_counts = [None]  # descriptor ids per leaf

    def split(node_id, idx, level):
        if level == depth or len(idx) <= branching:
            node_is_leaf[node_id] = True
            node_counts[node_id] = idx
            return
        centers, assign = _kmedians(bits[idx], branching, rng)
        for c in range(len(centers)):
            child = len(node_desc)
            node_desc.append(_pack(centers[c][None])[0])
            node_children.append([])
            node_parent.append(node_id)
            node_is_leaf.append(False)
            node_counts.append(None)
            node_children[node_id].append(child)
            split(child, idx[assign == c], level + 1)

    split(0, np.arange(len(bits)), 0)

    n = len(node_desc)
    kb = branching
    children = np.full((n, kb), -1, np.int32)
    for i, ch in enumerate(node_children):
        children[i, : len(ch)] = ch
    word_id = np.full(n, -1, np.int32)
    weight = np.zeros(n, np.float32)
    w = 0
    n_docs_eff = n_docs if n_docs is not None else len(bits)
    for i in range(n):
        if node_is_leaf[i]:
            word_id[i] = w
            idx = node_counts[i]
            if doc_ids is not None:
                ni = len(np.unique(doc_ids[idx])) if len(idx) else 0
            else:
                ni = len(idx)
            weight[i] = np.log(max(n_docs_eff, 2) / max(ni, 1))
            w += 1

    return Vocabulary(
        node_desc=np.asarray(np.stack(node_desc)),
        node_children=np.asarray(children),
        node_weight=np.asarray(weight),
        node_word=np.asarray(word_id),
        n_words=w,
        branching=kb,
        depth=depth,
    )


def build_vocabulary_native(
    descs: np.ndarray, branching: int = 10, depth: int = 5, seed: int = 0,
    n_docs: int | None = None, doc_ids: np.ndarray | None = None,
    iters: int = 8,
) -> Vocabulary:
    """Reference-scale vocabulary training through the native (C++)
    hierarchical k-medians trainer — the only way a 10^5-10^6-word tree
    (the reference's orbVoc.bin scale, TemplatedVocabulary.h:1563) trains in
    seconds instead of hours. Falls back to the Python trainer when the
    native library is unavailable. tf-idf weights follow DBoW2: idf over
    training documents."""
    import jax.numpy as jnp

    from ..native import bow_transform_native, vocab_train_native

    descs = np.ascontiguousarray(descs, np.uint32)
    out = vocab_train_native(descs, branching, depth, seed=seed, iters=iters)
    if out is None:
        return build_vocabulary(descs, branching, depth, seed=seed,
                                n_docs=n_docs, doc_ids=doc_ids)
    node_desc, children, node_word, leaf_count, n_nodes, n_words = out

    # idf weights (DBoW2 TF_IDF): weight_w = log(N_docs / n_docs_with_w).
    weight = np.zeros(n_nodes, np.float32)
    leaves = node_word >= 0
    if doc_ids is not None:
        zero_w = np.zeros(n_nodes, np.float32)
        word_per_desc, _ = bow_transform_native(
            descs, np.ones(len(descs), bool), node_desc, children, zero_w,
            node_word, branching, depth,
        )
        n_docs_eff = n_docs if n_docs is not None else int(doc_ids.max()) + 1
        pairs = np.unique(
            doc_ids.astype(np.int64) * n_words + word_per_desc, )
        n_per_word = np.bincount((pairs % n_words).astype(np.int64),
                                 minlength=n_words)
        weight[leaves] = np.log(
            max(n_docs_eff, 2) / np.maximum(n_per_word[node_word[leaves]], 1)
        )
    else:
        n_docs_eff = n_docs if n_docs is not None else len(descs)
        weight[leaves] = np.log(
            max(n_docs_eff, 2) / np.maximum(leaf_count[leaves], 1)
        )

    return Vocabulary(
        node_desc=np.asarray(node_desc),
        node_children=np.asarray(children),
        node_weight=np.asarray(weight),
        node_word=np.asarray(node_word),
        n_words=n_words,
        branching=branching,
        depth=depth,
    )


def training_descriptors(n_images: int = 40, n_features: int = 512, seed: int = 7):
    """Extract ORB descriptors from synthetic textures for default-vocab
    training. Returns (descs [M, 8] uint32, doc_ids [M])."""
    import jax.numpy as jnp

    from ..features.orb import OrbConfig, make_extractor
    from ..io.synthetic import smooth_texture

    cfg = OrbConfig(height=240, width=320, n_features=n_features, n_levels=4)
    extract = make_extractor(cfg)
    descs, docs = [], []
    for i in range(n_images):
        img = smooth_texture(240, 320, 24 + (i % 5) * 8, seed=seed + i)
        f = extract(jnp.asarray(img))
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc)[v])
        docs.append(np.full(v.sum(), i))
    return np.concatenate(descs), np.concatenate(docs)


def training_corpus(n_images: int = 800, n_features: int = 1024, seed: int = 11):
    """Reference-scale training corpus: ORB descriptors from hundreds of
    varied synthetic textures and rendered scene views (~n_images * 1k
    descriptors). Feeds the packaged 10^5-word vocabulary (the analogue of
    the reference's orbVoc.bin, which was trained on real image corpora —
    rendered imagery is this environment's only corpus)."""
    import jax.numpy as jnp

    from ..features.orb import OrbConfig, make_extractor
    from ..io import synthetic

    cfg = OrbConfig(height=480, width=640, n_features=n_features, n_levels=8)
    extract = make_extractor(cfg)
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    descs, docs = [], []
    # Mix: plain multi-scale textures + rendered room/plane scene views.
    scenes = [synthetic.default_scene(seed=s) for s in range(4)]
    scenes += [synthetic.room_scene(seed=40 + s) for s in range(4)]
    for i in range(n_images):
        if i % 3 == 0:
            cells = int(rng.integers(16, 96))
            img = synthetic.smooth_texture(480, 640, cells, seed=seed + i)
        else:
            scene = scenes[int(rng.integers(len(scenes)))]
            pos = rng.normal(0, 1.0, 3) * np.array([1.5, 0.3, 1.5])
            yaw = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(yaw), np.sin(yaw)
            Rwc = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            Tcw = np.eye(4)
            Tcw[:3, :3] = Rwc.T
            Tcw[:3, 3] = -Rwc.T @ pos
            img = synthetic.render(scene, Tcw, K, 480, 640)
        f = extract(jnp.asarray(img))
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc)[v])
        docs.append(np.full(int(v.sum()), i))
    return np.concatenate(descs), np.concatenate(docs)
