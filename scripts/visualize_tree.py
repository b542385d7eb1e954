#!/usr/bin/env python
"""Build a small Cobweb index over a sample corpus and render per-grandparent
subtree PNGs (reference scripts visualize_qqp.py:77 / visualize_ms_marco.py:108,
using the sample corpora instead of HF downloads)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()



def hash_encode(sentences, dim=64):
    out = np.zeros((len(sentences), dim), np.float32)
    for i, s in enumerate(sentences):
        rng = np.random.default_rng(abs(hash(s)) % (2 ** 31))
        out[i] = rng.normal(size=dim)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="user_corpus2")
    p.add_argument("--output-dir", default="outputs/visualizations")
    p.add_argument("--num-leaves", type=int, default=6)
    p.add_argument("--model", default=None,
                   help="HF/ST encoder (default: hermetic hash encoder)")
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import load_sample_corpuses
    from rag_cobweb_tpu.core.wrapper import CobwebIndex

    corpus = load_sample_corpuses()[args.corpus]
    if args.model:
        from rag_cobweb_tpu.bench.encoders import make_encoder
        encode = make_encoder(args.model)
    else:
        encode = hash_encode
    db = CobwebIndex(corpus, encode(corpus), encode_func=encode)
    db.print_tree()
    paths = db.visualize_subtrees(args.output_dir,
                                  num_leaves=args.num_leaves)
    print(f"rendered under {args.output_dir}")


if __name__ == "__main__":
    main()
