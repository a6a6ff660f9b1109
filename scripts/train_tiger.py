"""Train the GERMAN B5 POS tagger + B6 NP chunker on the TIGER chunk
corpus the reference bundles, and freeze the artifacts under
scoobie_spark/models/.

The reference trains its German Mallet CRF from exactly this file
(``TestNounPhraseChunker.java:37``: TRAIN_FILE_DE =
``.../npc/de/training_tiger.txt`` → ``npc/de/DE.crf``); the bundled
zip is ``corpora/tiger/training_tiger.txt.zip`` (49 077 sentences,
word / STTS-POS / B-I-O NP chunk — same 3-column format as conll2000,
so :func:`scoobie_spark.perceptron.read_conll2000` reads it as-is).

TIGER ships no test split, so the last 10% of sentences (file order,
deterministic) are held out for the reference's per-token-accuracy
evaluation (NounPhraseChunker.testCrf:369-395) and never trained on.

Usage:
    python scripts/train_tiger.py [--corpus DIR] [--iters N]
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
    ap.add_argument("--corpus", default="/root/reference/corpora/tiger")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--window", type=int, default=3)  # reference WINDOW_SIZE=3
    ap.add_argument("--holdout", type=float, default=0.1)
    args = ap.parse_args()

    sents = P.read_conll2000(os.path.join(args.corpus, "training_tiger.txt.zip"))
    cut = int(len(sents) * (1 - args.holdout))
    train, test = sents[:cut], sents[cut:]
    print(f"train sentences: {len(train)}  held-out sentences: {len(test)}")

    t0 = time.time()
    pos = P.train_pos(train, iters=args.iters)
    acc = P.token_accuracy(pos, test, "pos")
    print(f"POS tagger (de): {time.time() - t0:.0f}s, held-out accuracy {acc:.4f}")
    pos.save(P.POS_MODEL_DE)

    t0 = time.time()
    chunker = P.train_chunker(train, iters=args.iters, window=args.window)
    cacc = P.token_accuracy(chunker, test, "chunk", window=args.window)
    p, r, f1 = P.np_phrase_f1(chunker, test, window=args.window)
    print(
        f"chunker (de): {time.time() - t0:.0f}s, held-out accuracy {cacc:.4f}, "
        f"NP span P {p:.4f} R {r:.4f} F1 {f1:.4f}"
    )
    chunker.save(P.CHUNK_MODEL_DE)

    for path in (P.POS_MODEL_DE, P.CHUNK_MODEL_DE):
        print(f"{path}: {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
