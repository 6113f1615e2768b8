"""Train and package the reference-scale BoW vocabulary.

The reference ships orbVoc.bin — a ~10^6-node (10^5-10^6 word) DBoW2 tree
trained on real image corpora (TemplatedVocabulary.h:1563; README.md:24).
This environment has no real-image corpus, so the training descriptors come
from ORB extraction over hundreds of rendered synthetic scenes and textures
(vocab/train.py training_corpus) — the same image statistics the bench and
tests see.

Usage:
    python scripts/train_vocab.py [--images 1200] [--depth 5] [--out PATH]

Writes os1_tpu/data/vocab_100k.bin (k=10, L=5 -> up to 10^5 words; ~5 MB)
and prints tree stats + a bow.compute timing at the new scale.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1200)
    ap.add_argument("--features", type=int, default=1024)
    ap.add_argument("--branching", type=int, default=10)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os1_tpu  # noqa: F401  (matmul precision config)
    from os1_tpu.vocab.train import build_vocabulary_native, training_corpus
    from os1_tpu.vocab import dbow2

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "os1_tpu", "data", "vocab_100k.bin"
    )
    out = os.path.abspath(out)

    cache = f"/tmp/os1_vocab_corpus_{args.images}_{args.features}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        descs, docs = z["descs"], z["docs"]
    else:
        descs, docs = training_corpus(
            n_images=args.images, n_features=args.features
        )
        np.savez_compressed(cache, descs=descs, docs=docs)
    t_corpus = time.time() - t0
    print(f"corpus: {len(descs)} descriptors from {args.images} images "
          f"({t_corpus:.1f}s)")

    t0 = time.time()
    vocab = build_vocabulary_native(
        descs, branching=args.branching, depth=args.depth,
        n_docs=int(docs.max()) + 1, doc_ids=docs,
    )
    t_train = time.time() - t0
    print(f"trained: {vocab.n_words} words, {len(vocab.node_desc)} nodes, "
          f"k={vocab.branching} L={vocab.depth} ({t_train:.1f}s)")

    dbow2.save_binary(vocab, out)
    size_mb = os.path.getsize(out) / 1e6
    print(f"saved {out} ({size_mb:.1f} MB)")

    # Reload through the native mmap loader and time the BoW transform at
    # the new scale (the reference's binary-load + ComputeBoW speed story).
    t0 = time.time()
    v2 = dbow2.load_binary(out)
    t_load = time.time() - t0
    assert v2.n_words == vocab.n_words
    from os1_tpu.vocab.database import KeyFrameDatabase

    db = KeyFrameDatabase(vocab=v2, max_keyframes=128)
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2**32, (args.features, 8), dtype=np.uint64).astype(np.uint32)
    valid = np.ones(args.features, bool)
    db.compute_bow(d, valid)  # warm
    t0 = time.time()
    for _ in range(10):
        word, weight, bow = db.compute_bow(d, valid)
    t_bow = (time.time() - t0) / 10 * 1e3
    print(f"load: {t_load*1e3:.0f} ms | bow.compute: {t_bow:.2f} ms/KF "
          f"({int((word >= 0).sum())} words assigned)")


if __name__ == "__main__":
    main()
