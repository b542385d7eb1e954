"""rag_cobweb_tpu — a TPU-native (JAX/XLA/Pallas) incremental hierarchical vector database.

A ground-up rebuild of the capabilities of Teachable-AI-Lab/RAG-Cobweb: the Cobweb
incremental concept-formation algorithm used as a hierarchical vector index for
RAG-style semantic retrieval.  Instead of a pointer-graph of per-node torch tensors
driven by Python control flow (reference: src/cobweb/CobwebTorchNode.py,
CobwebTorchTree.py), the tree lives as a flat Structure-of-Arrays in device memory,
the full insert descent runs inside a single jitted ``lax.while_loop``, and queries
execute as fused batched diagonal-Gaussian scoring + padded path-sum + ``lax.top_k``.

Layers:
  ops/        pure jittable math kernels (Welford/Chan stats, Gaussian scores,
              the four Cobweb restructure-op utilities, FastICA, top-k helpers)
  core/       the flat-array CobwebTree, the prediction index, and the
              ``CobwebIndex`` database facade (reference CobwebWrapper parity)
  whitening/  PCA / ZCA / PCA+ICA whitening as XLA matmuls
  parallel/   forest sharding over a ``jax.sharding.Mesh`` (shard_map + collectives)
  training/   FactorVAE and query-encoder fine-tuning (flax/optax)
  bench/      QQP / MS-MARCO eval harness, metrics, baselines, reports
"""

__version__ = "0.1.0"

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree

try:  # wrapper pulls in the full query stack; keep core importable standalone
    from rag_cobweb_tpu.core.wrapper import CobwebIndex
except ImportError:  # pragma: no cover - during partial builds
    CobwebIndex = None

__all__ = ["TreeConfig", "CobwebTree", "CobwebIndex", "__version__"]
