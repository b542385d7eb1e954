"""Gaussian sufficient-statistics and scoring kernels.

Pure, shape-polymorphic jittable functions over diagonal-Gaussian concept
statistics ``(count, mean, m2)`` where ``m2`` is the Welford second central
moment (sum of squared deviations).  These are the TPU-native equivalents of
the per-node tensor math in the reference:

  - Welford single-instance update      (CobwebTorchNode.increment_counts, :57-68)
  - Chan parallel merge of two concepts (CobwebTorchNode.update_counts_from_node, :70-85)
  - diagonal-Gaussian log-density       (CobwebTorchNode.log_prob, :100-104)
  - variance policy                     (CobwebTorchTree.compute_var, :336-342)
  - concept-divergence score            (CobwebTorchTree.compute_score, :344-364)

All functions broadcast over leading axes, so a single definition serves the
scalar case, the per-child masked case ``(F, D)``, and the batched-query
case ``(B, N, D)`` via ``vmap``/broadcasting — no per-node Python loops.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rag_cobweb_tpu.core.config import TreeConfig

_LOG_2PI = math.log(2.0 * math.pi)


class GaussStats(NamedTuple):
    """Sufficient statistics of one (or a batch of) diagonal-Gaussian concept(s).

    count: ()   or (...,)      observation count
    mean:  (D,) or (..., D)    running mean
    m2:    (D,) or (..., D)    sum of squared deviations from the mean
    """

    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def empty_stats(dim: int, dtype=jnp.float32) -> GaussStats:
    return GaussStats(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def welford_insert(stats: GaussStats, x: jnp.ndarray) -> GaussStats:
    """Incorporate one instance into running stats (Welford's algorithm).

    Matches CobwebTorchNode.increment_counts (:57-68) / mean_var_insert (:214-222).
    """
    count = stats.count + 1.0
    delta = x - stats.mean
    cnt = count[..., None] if count.ndim else count
    mean = stats.mean + delta / cnt
    m2 = stats.m2 + delta * (x - mean)
    return GaussStats(count, mean, m2)


def chan_merge(a: GaussStats, b: GaussStats) -> GaussStats:
    """Merge two sets of stats (Chan et al. parallel combine).

    Matches CobwebTorchNode.update_counts_from_node (:70-85): note the reference
    computes the merged m2 with the *pre-merge* means, then the merged mean.
    """
    total = a.count + b.count
    delta = b.mean - a.mean
    # Guard the empty+empty case (total == 0) — reference never hits it because
    # merge operands always have count >= 1, but masked lanes may be all-zero.
    safe_total = jnp.where(total > 0, total, 1.0)
    ac = a.count[..., None] if a.count.ndim else a.count
    bc = b.count[..., None] if b.count.ndim else b.count
    st = safe_total[..., None] if safe_total.ndim else safe_total
    m2 = a.m2 + b.m2 + delta * delta * ((ac * bc) / st)
    mean = (ac * a.mean + bc * b.mean) / st
    return GaussStats(total, mean, m2)


def compute_var(m2: jnp.ndarray, count: jnp.ndarray, cfg: TreeConfig) -> jnp.ndarray:
    """Variance policy (CobwebTorchTree.compute_var, :336-342).

    acuity_cutoff: clamp the ML variance from below at prior_var;
    otherwise: additive prior ``m2/count + prior_var``.
    ``count`` broadcasts against the trailing feature axis of ``m2``.
    """
    safe_count = jnp.where(count > 0, count, 1.0)
    ml_var = m2 / safe_count
    if cfg.acuity_cutoff:
        var = jnp.maximum(ml_var, cfg.prior_var)
    else:
        var = ml_var + cfg.prior_var
    # Empty concepts (count == 0) take the prior variance — reference fills
    # prior_var for empty nodes when building its prediction index
    # (CobwebWrapper.py:199-203).
    return jnp.where(count > 0, var, jnp.full_like(var, cfg.prior_var))


def stats_mean_var(stats: GaussStats, cfg: TreeConfig):
    """(mean, var) of a concept — CobwebTorchNode.mean_var (:211-212)."""
    return stats.mean, compute_var(stats.m2, stats.count[..., None], cfg)


def insert_mean_var(stats: GaussStats, x: jnp.ndarray, cfg: TreeConfig):
    """(mean, var) of a concept after hypothetically absorbing ``x``.

    CobwebTorchNode.mean_var_insert (:214-222) — does not mutate.
    """
    s = welford_insert(stats, x)
    return s.mean, compute_var(s.m2, s.count[..., None], cfg)


def merge_mean_var(a: GaussStats, b: GaussStats, x: jnp.ndarray, cfg: TreeConfig):
    """(mean, var) of merge(a, b) after absorbing ``x`` (mean_var_merge, :224-239)."""
    s = welford_insert(chan_merge(a, b), x)
    return s.mean, compute_var(s.m2, s.count[..., None], cfg)


def new_mean_var(x: jnp.ndarray, cfg: TreeConfig):
    """(mean, var) of a brand-new concept seeded by ``x`` (mean_var_new, :204-209)."""
    return x, jnp.full_like(x, cfg.prior_var)


def log_prob(x: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-Gaussian log-density (CobwebTorchNode.log_prob, :100-104).

    Reduces over the trailing feature axis; leading axes broadcast, so this
    single definition covers (D,)x(N,D) -> (N,) and (B,1,D)x(N,D) -> (B,N).
    """
    return -0.5 * jnp.sum(
        jnp.log(var) + _LOG_2PI + jnp.square(x - mean) / var, axis=-1
    )


def node_log_prob_terms(mean: jnp.ndarray, var: jnp.ndarray):
    """Precompute per-node affine terms so batched log-prob becomes two GEMMs.

    For the prediction index (CobwebWrapper.cobweb_predict_indexed, :230-236 —
    which drops the 2*pi constant), the per-(query, node) score is
        -0.5 * ( sum(log var) + sum((x - mu)^2 / var) )
      =  x @ (mu/var)^T  - 0.5 * x^2 @ (1/var)^T  - 0.5 * (sum(mu^2/var) + sum(log var))
    Returns (inv_var_T, mu_over_var_T, const) laid out for MXU matmuls.
    """
    inv_var = 1.0 / var                      # (N, D)
    mu_over_var = mean * inv_var             # (N, D)
    const = -0.5 * (jnp.sum(jnp.square(mean) * inv_var, axis=-1)
                    + jnp.sum(jnp.log(var), axis=-1))  # (N,)
    return inv_var.T, mu_over_var.T, const


def batched_node_log_probs(x: jnp.ndarray, inv_var_T: jnp.ndarray,
                           mu_over_var_T: jnp.ndarray, const: jnp.ndarray) -> jnp.ndarray:
    """(B, D) queries against N node Gaussians -> (B, N) log-probs via 2 GEMMs.

    This is the MXU-friendly form of the reference's broadcast-subtract-square
    (CobwebWrapper.py:230-236): one matmul for the cross term, one for the
    quadratic term, plus a per-node constant.  HIGHEST precision keeps the
    contraction in f32 on TPU (default bf16 matmuls cost ~2% score error,
    enough to perturb top-k ranking near ties).
    """
    cross = jnp.dot(x, mu_over_var_T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    quad = jnp.dot(jnp.square(x), inv_var_T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return cross - 0.5 * quad + const


def compute_score(mu1, var1, mu2, var2, cfg: TreeConfig) -> jnp.ndarray:
    """Concept-divergence score (CobwebTorchTree.compute_score, :344-364).

    use_info & use_kl : KL(N(mu1,var1) || N(mu2,var2)) for diagonal Gaussians
    use_info & !use_kl: 0.5 * sum(log var2 - log var1)   ("info" delta-entropy)
    !use_info         : classic continuous category-utility difference
                        sum( 1/(2 sqrt(pi) sigma2) ) - sum( 1/(2 sqrt(pi) sigma1) )
                        NOTE the reference computes -1/(2 sqrt(pi) s1) + 1/(2 sqrt(pi) s2);
                        we reproduce that exactly.
    Reduces over the trailing axis; leading axes broadcast.
    """
    if cfg.use_info:
        if cfg.use_kl:
            d = mu1.shape[-1]
            score = jnp.sum(jnp.log(var2) - jnp.log(var1), axis=-1)
            score = score + jnp.sum((var1 + jnp.square(mu1 - mu2)) / var2, axis=-1)
            score = (score - d) * 0.5
            return score
        return 0.5 * jnp.sum(jnp.log(var2) - jnp.log(var1), axis=-1)
    inv_sqrt_pi_half = 1.0 / (2.0 * math.sqrt(math.pi))
    return (jnp.sum(inv_sqrt_pi_half / jnp.sqrt(var2), axis=-1)
            - jnp.sum(inv_sqrt_pi_half / jnp.sqrt(var1), axis=-1))
