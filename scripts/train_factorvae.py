#!/usr/bin/env python
"""FactorVAE training CLI (reference src/training/factorvae_train.py:375-423).

Tasks: qqp / msmarco (need HF access or a cached .npy), synthetic (hermetic),
or --embeddings path to any .npy matrix.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["qqp", "msmarco", "synthetic"],
                   default="synthetic")
    p.add_argument("--embeddings", type=str, default=None,
                   help=".npy embedding matrix (overrides --task)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--z-dim", type=int, default=392)
    p.add_argument("--gamma", type=float, default=10.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--embed-model", type=str, default="bert-base-uncased")
    p.add_argument("--max-embed-samples", type=int, default=20000)
    args = p.parse_args()

    from rag_cobweb_tpu.training.factorvae import FactorVAE
    from rag_cobweb_tpu.bench import datasets, encoders

    if args.embeddings:
        X = np.load(args.embeddings)
    elif args.task == "synthetic":
        X = datasets.synthetic_retrieval(
            corpus_size=args.max_embed_samples, target_size=1,
            dim=768, seed=args.seed,
        ).corpus_embs
    else:
        data = (datasets.load_qqp if args.task == "qqp"
                else datasets.load_ms_marco)(
            corpus_size=args.max_embed_samples, target_size=1
        )
        enc = encoders.make_encoder(args.embed_model)
        X = enc(data.corpus)

    save_dir = args.save_dir or f"models/factorvae_{args.task}_ckpts"
    vae = FactorVAE(input_dim=X.shape[1], z_dim=args.z_dim,
                    gamma=args.gamma, lr=args.lr, seed=args.seed)
    vae.fit(X, epochs=args.epochs, batch_size=args.batch_size,
            save_dir=save_dir, seed=args.seed, log_every=1)
    print("done; checkpoints in", save_dir)


if __name__ == "__main__":
    main()
