#!/usr/bin/env python
"""Compare embedding decorrelation across whitening approaches (the working
version of the reference's src/whitening/whitened_models_test.py:13-131,
which shipped with a broken import): raw vs PCA+ICA vs PCA+ZCA vs ZCA vs
FactorVAE latents, reporting mean |off-diagonal| correlation and top
correlated pairs for each."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--embeddings", type=str, default=None,
                   help=".npy matrix; default: synthetic corpus")
    p.add_argument("--samples", type=int, default=5000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--pca-dim", type=int, default=128)
    p.add_argument("--factorvae-epochs", type=int, default=3)
    args = p.parse_args()

    from rag_cobweb_tpu.bench.datasets import synthetic_retrieval
    from rag_cobweb_tpu.training.factorvae import (
        FactorVAE, latent_correlation_diagnostics,
    )
    from rag_cobweb_tpu.whitening import (
        PCAICAWhiteningModel, PCAZCAWhiteningModel, ZCAWhiteningModel,
    )

    if args.embeddings:
        X = np.load(args.embeddings)[: args.samples]
    else:
        X = synthetic_retrieval(args.samples, 1, args.dim).corpus_embs

    def report(name, Z):
        d = latent_correlation_diagnostics(Z, top_k=3)
        print(f"{name:<22} mean|offdiag corr| = "
              f"{d['mean_abs_offdiag']:.5f}  top: "
              f"{[(i, j, round(c, 3)) for i, j, c in d['top_pairs']]}")

    report("raw", X)
    pca_ica = PCAICAWhiteningModel.fit(X, pca_dim=args.pca_dim,
                                       ica_max_iter=500)
    report("PCA+ICA", pca_ica.transform(X))
    report("PCA only (normed)", pca_ica.transform(X, is_ica=False))
    pca_zca = PCAZCAWhiteningModel.fit(X, pca_dim=min(args.pca_dim,
                                                      X.shape[1]))
    report("PCA->ZCA", pca_zca.transform(X))
    zca = ZCAWhiteningModel.fit(X)
    report("ZCA", zca.transform(X))

    vae = FactorVAE(input_dim=X.shape[1], z_dim=args.pca_dim, hidden=512,
                    lr=1e-3)
    vae.fit(X, epochs=args.factorvae_epochs, batch_size=256,
            diag_samples=min(4096, len(X)))
    report("FactorVAE latents", np.asarray(vae.encode(X[:4096])))


if __name__ == "__main__":
    main()
