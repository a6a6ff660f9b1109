"""Train the B5 POS tagger + B6 NP chunker on the CoNLL-2000 corpus the
reference bundles, and freeze the artifacts under scoobie_spark/models/.

Mirrors the reference's training entry points
(``transducer/model/NounPhraseChunker.java:246-314`` trains the Mallet
CRF on ``corpora/conll2000/training_conll2000.txt``; evaluation is
per-token accuracy on the test file, ``testCrf:369-395``) with the
averaged-perceptron twins in ``scoobie_spark/perceptron.py``.

Usage:
    python scripts/train_conll2000.py [--corpus DIR] [--iters N]

DIR defaults to the reference checkout's corpora/conll2000; the script
reads the zips directly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scoobie_spark import perceptron as P


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/root/reference/corpora/conll2000")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--window", type=int, default=3)
    args = ap.parse_args()

    train = P.read_conll2000(os.path.join(args.corpus, "training_conll2000.txt.zip"))
    test = P.read_conll2000(os.path.join(args.corpus, "test_conll2000.txt.zip"))
    print(f"train sentences: {len(train)}  test sentences: {len(test)}")

    t0 = time.time()
    pos = P.train_pos(train, iters=args.iters)
    acc = P.token_accuracy(pos, test, "pos")
    print(f"POS tagger: {time.time() - t0:.0f}s, test accuracy {acc:.4f}")
    pos.save(P.POS_MODEL)

    t0 = time.time()
    chunker = P.train_chunker(train, iters=args.iters, window=args.window)
    cacc = P.token_accuracy(chunker, test, "chunk", window=args.window)
    print(f"chunker: {time.time() - t0:.0f}s, test accuracy {cacc:.4f}")
    chunker.save(P.CHUNK_MODEL)

    for path in (P.POS_MODEL, P.CHUNK_MODEL):
        print(f"{path}: {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
