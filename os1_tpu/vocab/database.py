"""Keyframe place-recognition database: dense BoW matrix + candidate queries.

Replaces the reference's inverted-file KeyFrameDatabase (KeyFrameDatabase.cc,
341 LoC of per-word list walking) with a dense [K_max, W] BoW matrix: the
shared-word filter, the L1 similarity, and the threshold protocol
(shared words >= 0.8 * max, score >= min, KeyFrameDatabase.cc:74-197) each
become one masked reduction over the whole keyframe axis.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import tree
from .tree import Vocabulary


@functools.partial(jax.jit, static_argnames=("n_words", "depth"))
def _frame_bow(vocab_arrays, desc, valid, n_words, depth):
    node_desc, node_children, node_word, node_weight = vocab_arrays
    word, weight = tree._descend(
        node_desc, node_children, node_word, node_weight, desc, depth
    )
    word = jnp.where(valid, word, -1)
    weight = jnp.where(valid, weight, 0.0)
    return word, weight, tree.bow_vector(word, weight, n_words)


def _query_scores(v, mat, active):
    """Host numpy: the [K, W] database is ~1 MB — the arithmetic is far
    cheaper than a device dispatch + readback round trip per query."""
    shared = ((mat > 0) & (v[None, :] > 0)).sum(-1).astype(np.int32)
    scores = 1.0 - 0.5 * np.abs(mat - v[None, :]).sum(-1)
    return np.where(active, shared, 0), np.where(active, scores, -1.0)


@dataclass
class KeyFrameDatabase:
    vocab: Vocabulary
    max_keyframes: int

    def __post_init__(self):
        self.bow = np.zeros((self.max_keyframes, self.vocab.n_words), np.float32)
        self.active = np.zeros(self.max_keyframes, bool)
        self.kf_words: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ #
    def compute_bow(self, desc, valid):
        """(word ids [N], weights [N], dense vector [W]) for one frame."""
        arrays = (
            self.vocab.node_desc, self.vocab.node_children,
            self.vocab.node_word, self.vocab.node_weight,
        )
        word, weight, v = _frame_bow(
            arrays, jnp.asarray(desc), jnp.asarray(valid),
            self.vocab.n_words, self.vocab.depth,
        )
        return np.asarray(word), np.asarray(weight), np.asarray(v)

    def add(self, kf: int, bow_vec: np.ndarray) -> None:
        self.bow[kf] = bow_vec
        self.active[kf] = True

    def erase(self, kf: int) -> None:
        self.active[kf] = False
        self.bow[kf] = 0.0

    def clear(self) -> None:
        self.active[:] = False
        self.bow[:] = 0.0

    # ------------------------------------------------------------------ #
    def query(self, bow_vec: np.ndarray, exclude: np.ndarray | None = None,
              min_score: float = 0.0):
        """Candidate keyframes by the reference's two-stage filter
        (DetectLoopCandidates / DetectRelocalizationCandidates,
        KeyFrameDatabase.cc:74-197 / :199-336):
        shared words >= 0.8 * best, score >= min_score.

        Returns (kf ids sorted by score desc, their scores).
        """
        active = self.active.copy()
        if exclude is not None:
            active[exclude] = False
        if not active.any():
            return np.empty(0, np.int64), np.empty(0, np.float32)
        shared, scores = _query_scores(np.asarray(bow_vec), self.bow, active)
        max_shared = shared.max()
        if max_shared == 0:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        keep = (shared >= 0.8 * max_shared) & (scores >= min_score) & active
        ids = np.nonzero(keep)[0]
        order = np.argsort(-scores[ids], kind="stable")
        ids = ids[order]
        return ids, scores[ids]
