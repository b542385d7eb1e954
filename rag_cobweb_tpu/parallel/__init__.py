"""Distributed layer: forest sharding over a device mesh + multi-host init.

The reference has no distributed backend (SURVEY.md §2c); this package is
the TPU build's first-class replacement.
"""

from rag_cobweb_tpu.parallel.forest import CobwebForest, make_mesh
from rag_cobweb_tpu.parallel.distributed import forest_mesh, initialize
from rag_cobweb_tpu.parallel.tp import (
    TPFusedPredictionIndex, TPPredictionIndex)

__all__ = ["CobwebForest", "make_mesh", "forest_mesh", "initialize",
           "TPFusedPredictionIndex", "TPPredictionIndex"]
