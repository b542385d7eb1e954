"""Embedding whitening (reference src/whitening/: pca_ica.py, pca_zca.py, zca.py).

Whitening is the load-bearing trick of the whole system: raw-embedding Cobweb
recall@10 is ~0.15 vs ~0.91 with PCA+ICA at the same corpus size
(BASELINE.md).  Models are fit once on host in float64 (eigendecompositions
and the FastICA fixed-point iteration want the precision), and the fitted
transform is two matmuls — pure XLA, fused into the encode path on TPU.
"""

from rag_cobweb_tpu.whitening.models import (
    PCAICAWhiteningModel,
    PCAZCAWhiteningModel,
    ZCAWhiteningModel,
    encode_and_whiten_pcaica,
    encode_and_whiten_pcazca,
    encode_and_whiten_zca,
)
from rag_cobweb_tpu.whitening.fastica import fastica

__all__ = [
    "PCAICAWhiteningModel",
    "PCAZCAWhiteningModel",
    "ZCAWhiteningModel",
    "encode_and_whiten_pcaica",
    "encode_and_whiten_pcazca",
    "encode_and_whiten_zca",
    "fastica",
]
