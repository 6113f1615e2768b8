"""Train the reference-scale 10^6-node vocabulary (k=10, L=6) from the
sharded rendered corpus (scripts/gen_vocab_corpus.py shards), save it as
os1_tpu/data/vocab_1m.bin (DBoW2 binary, wire-compatible), and print tree
stats + end-to-end bow.compute timing at the new scale.

The reference's orbVoc.bin is ~10^6 nodes (TemplatedVocabulary.h:1563,
README.md:24); this is its analogue trained on rendered imagery (the only
corpus available here).
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import os1_tpu  # noqa: F401
from os1_tpu.vocab import dbow2
from os1_tpu.vocab.train import build_vocabulary_native


def main():
    shards = sorted(glob.glob("/tmp/os1_vocab_shard_*.npz"))
    assert shards, "run scripts/gen_vocab_corpus.py first"
    descs, docs = [], []
    doc_off = 0
    for s in shards:
        z = np.load(s)
        descs.append(z["descs"])
        docs.append(z["docs"] + doc_off)
        doc_off = int(docs[-1].max()) + 1
    descs = np.concatenate(descs)
    docs = np.concatenate(docs)
    print(f"corpus: {len(descs)} descriptors / {doc_off} images "
          f"from {len(shards)} shards")

    t0 = time.time()
    vocab = build_vocabulary_native(
        descs, branching=10, depth=6, seed=0,
        n_docs=doc_off, doc_ids=docs, iters=6,
    )
    n_nodes = len(np.asarray(vocab.node_desc))
    print(f"trained: {n_nodes} nodes, {vocab.n_words} words "
          f"(k={vocab.branching}, L={vocab.depth}) in {time.time()-t0:.0f}s")

    out = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "os1_tpu", "data", "vocab_1m.bin"
    ))
    t0 = time.time()
    dbow2.save_binary(vocab, out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB, "
          f"{time.time()-t0:.0f}s)")

    # Reload through the native binary loader + time the full bow.compute.
    t0 = time.time()
    v2 = dbow2.load_binary(out)
    print(f"reload: {time.time()-t0:.2f}s, {v2.n_words} words")
    from os1_tpu.vocab.database import KeyFrameDatabase

    db = KeyFrameDatabase(v2, 128)
    rng = np.random.default_rng(0)
    desc = descs[rng.choice(len(descs), 1024, replace=False)]
    valid = np.ones(1024, bool)
    db.compute_bow(desc, valid)
    t0 = time.perf_counter()
    for _ in range(20):
        w, wt, bow = db.compute_bow(desc, valid)
    print(f"bow.compute @ {v2.n_words} words: "
          f"{(time.perf_counter()-t0)/20*1e3:.2f} ms/KF, "
          f"{len(bow.words)} distinct words/KF")


if __name__ == "__main__":
    main()
