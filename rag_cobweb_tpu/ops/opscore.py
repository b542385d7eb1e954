"""Vectorized category-utility scoring of the four Cobweb restructure operations.

TPU-native replacement for the per-child Python loops in the reference
(CobwebTorchNode.two_best_children :374-420, get_best_operation :287-372,
pu_for_insert :422-460, pu_for_new_child :482-515, pu_for_merge :550-591,
pu_for_split :611-650).

All children of the current node are scored at once over a fixed-fanout block
``(F, D)`` with a validity mask — one fused XLA computation per tree level
instead of O(children) sequential vector ops.  Tie-breaking follows the
reference's lexicographic ``(score, count, random)`` ordering
(CobwebTorchNode.py:406-408) with a keyed-PRNG third key replacing Python
``random()`` for reproducibility.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.ops.gaussian import (
    GaussStats,
    compute_score,
    insert_mean_var,
    merge_mean_var,
    new_mean_var,
    stats_mean_var,
)

# Operation codes (dispatch targets of the descent loop).
OP_BEST = 0
OP_NEW = 1
OP_MERGE = 2
OP_SPLIT = 3

_NEG_INF = jnp.float32(-jnp.inf)


class TwoBest(NamedTuple):
    best1: jnp.ndarray      # () int32 index into the fanout block
    best2: jnp.ndarray      # () int32 index (may equal -1 when only one child)
    best1_pu: jnp.ndarray   # () f32 — pu_for_insert(best1) (0 in greedy mode)


def _lex_argmax(primary, secondary, noise, mask):
    """argmax by (primary, secondary, noise) over masked lanes.

    Mirrors the reference's ``sort(reverse=True)`` over
    ``(score, count, random())`` tuples (CobwebTorchNode.py:406-408).
    """
    p = jnp.where(mask, primary, _NEG_INF)
    m1 = jnp.max(p)
    t1 = mask & (p == m1)
    s = jnp.where(t1, secondary, _NEG_INF)
    m2 = jnp.max(s)
    t2 = t1 & (s == m2)
    r = jnp.where(t2, noise, _NEG_INF)
    return jnp.argmax(r).astype(jnp.int32)


def _child_scores_vs_parent(child_mean, child_var, parent_mean, parent_var, cfg):
    """score(child || parent) per fanout lane: (F, D) x (D,) -> (F,)."""
    return compute_score(child_mean, child_var, parent_mean[None, :],
                         parent_var[None, :], cfg)


def two_best_children(
    x: jnp.ndarray,
    parent: GaussStats,
    children: GaussStats,      # batched over F
    mask: jnp.ndarray,          # (F,) bool
    cfg: TreeConfig,
    key: jax.Array,
) -> TwoBest:
    """Pick the two children with the highest relative insert utility.

    Relative utility of child c (CobwebTorchNode.two_best_children :391-406):
        (c.count+1)/(p.count+1) * score(insert(c,x) || insert(p,x))
      -  c.count   /(p.count+1) * score(c          || insert(p,x))
    """
    p_ins_mean, p_ins_var = insert_mean_var(parent, x, cfg)

    c_ins_mean, c_ins_var = insert_mean_var(children, x[None, :], cfg)
    c_mean, c_var = stats_mean_var(children, cfg)

    denom = parent.count + 1.0
    gain = ((children.count + 1.0) / denom) * _child_scores_vs_parent(
        c_ins_mean, c_ins_var, p_ins_mean, p_ins_var, cfg
    ) - (children.count / denom) * _child_scores_vs_parent(
        c_mean, c_var, p_ins_mean, p_ins_var, cfg
    )

    noise = jax.random.uniform(key, mask.shape)
    best1 = _lex_argmax(gain, children.count, noise, mask)

    mask2 = mask & (jnp.arange(mask.shape[0]) != best1)
    has_second = jnp.any(mask2)
    best2 = jnp.where(has_second,
                      _lex_argmax(gain, children.count, noise, mask2),
                      jnp.int32(-1))

    if cfg.greedy:
        best1_pu = jnp.zeros(())  # COBWEB_GREEDY_MODE short-circuit (:411-414)
    else:
        best1_pu = pu_for_insert(x, parent, children, mask, best1, cfg)
    return TwoBest(best1, best2, best1_pu)


def _masked_weighted_sum(weights, scores, mask):
    return jnp.sum(jnp.where(mask, weights * scores, 0.0))


def pu_for_insert(x, parent: GaussStats, children: GaussStats, mask, best1, cfg):
    """Category utility of adding ``x`` to child ``best1`` (pu_for_insert :422-460)."""
    p_ins_mean, p_ins_var = insert_mean_var(parent, x, cfg)
    c_mean, c_var = stats_mean_var(children, cfg)
    c_ins_mean, c_ins_var = insert_mean_var(children, x[None, :], cfg)

    is_best = jnp.arange(mask.shape[0]) == best1
    sel_mean = jnp.where(is_best[:, None], c_ins_mean, c_mean)
    sel_var = jnp.where(is_best[:, None], c_ins_var, c_var)
    sel_count = jnp.where(is_best, children.count + 1.0, children.count)

    denom = parent.count + 1.0
    scores = _child_scores_vs_parent(sel_mean, sel_var, p_ins_mean, p_ins_var, cfg)
    nc = jnp.sum(mask)
    return _masked_weighted_sum(sel_count / denom, scores, mask) / nc


def pu_for_new_child(x, parent: GaussStats, children: GaussStats, mask, cfg):
    """Category utility of giving ``x`` its own new child (pu_for_new_child :482-515)."""
    p_ins_mean, p_ins_var = insert_mean_var(parent, x, cfg)
    c_mean, c_var = stats_mean_var(children, cfg)

    denom = parent.count + 1.0
    scores = _child_scores_vs_parent(c_mean, c_var, p_ins_mean, p_ins_var, cfg)
    total = _masked_weighted_sum(children.count / denom, scores, mask)

    new_mean, new_var = new_mean_var(x, cfg)
    total = total + (1.0 / denom) * compute_score(new_mean, new_var,
                                                  p_ins_mean, p_ins_var, cfg)
    nc = jnp.sum(mask)
    return total / (nc + 1.0)


def pu_for_merge(x, parent: GaussStats, children: GaussStats, mask, best1, best2, cfg):
    """Category utility of merging the two best children (pu_for_merge :550-591)."""
    p_ins_mean, p_ins_var = insert_mean_var(parent, x, cfg)
    c_mean, c_var = stats_mean_var(children, cfg)

    lanes = jnp.arange(mask.shape[0])
    others = mask & (lanes != best1) & (lanes != best2)
    denom = parent.count + 1.0
    scores = _child_scores_vs_parent(c_mean, c_var, p_ins_mean, p_ins_var, cfg)
    total = _masked_weighted_sum(children.count / denom, scores, others)

    b1 = jax.tree.map(lambda a: a[best1], children)
    b2 = jax.tree.map(lambda a: a[best2], children)
    m_mean, m_var = merge_mean_var(b1, b2, x, cfg)
    w = (b1.count + b2.count + 1.0) / denom
    total = total + w * compute_score(m_mean, m_var, p_ins_mean, p_ins_var, cfg)

    nc = jnp.sum(mask)
    return total / (nc - 1.0)


def pu_for_split(parent: GaussStats, children: GaussStats, mask, best1,
                 grandchildren: GaussStats, gc_mask, cfg):
    """Category utility of splitting best1 into the current node (pu_for_split :611-650).

    Uses the parent's *current* stats (no hypothetical insert) — split recurses
    on the same node, so the instance is not absorbed yet.
    ``grandchildren`` are the children of best1, gathered by the caller.
    """
    p_mean, p_var = stats_mean_var(parent, cfg)
    c_mean, c_var = stats_mean_var(children, cfg)

    lanes = jnp.arange(mask.shape[0])
    others = mask & (lanes != best1)
    scores = _child_scores_vs_parent(c_mean, c_var, p_mean, p_var, cfg)
    total = _masked_weighted_sum(children.count / parent.count, scores, others)

    g_mean, g_var = stats_mean_var(grandchildren, cfg)
    g_scores = _child_scores_vs_parent(g_mean, g_var, p_mean, p_var, cfg)
    total = total + _masked_weighted_sum(grandchildren.count / parent.count,
                                         g_scores, gc_mask)

    nc = jnp.sum(mask)
    ngc = jnp.sum(gc_mask)
    return total / (nc - 1.0 + ngc)


def best_operation(
    x: jnp.ndarray,
    parent: GaussStats,
    children: GaussStats,
    mask: jnp.ndarray,
    two_best: TwoBest,
    grandchildren: GaussStats,
    gc_mask: jnp.ndarray,
    cfg: TreeConfig,
    key: jax.Array,
    fanout_full: jnp.ndarray,
    split_fits: jnp.ndarray,
):
    """Pick the best of {best, new, merge, split} (get_best_operation :287-372).

    Structural gating beyond the reference (SURVEY.md §7 hard-part 2):
      - ``new`` is masked out when the fanout block is full (fanout_full);
      - ``split`` is masked out when promoting best1's children would overflow
        the fanout block (~split_fits).
    Returns (op_code, op_utility).
    """
    nc = jnp.sum(mask)
    pu_best = two_best.best1_pu
    pu_new = pu_for_new_child(x, parent, children, mask, cfg)
    pu_merge = pu_for_merge(x, parent, children, mask,
                            two_best.best1, two_best.best2, cfg)
    pu_split = pu_for_split(parent, children, mask, two_best.best1,
                            grandchildren, gc_mask, cfg)

    merge_ok = (nc > 2) & (two_best.best2 >= 0)          # reference gate (:364)
    split_ok = jnp.any(gc_mask) & split_fits              # reference gate (:367) + fanout
    new_ok = ~fanout_full

    utilities = jnp.stack([pu_best, pu_new, pu_merge, pu_split])
    valid = jnp.stack([jnp.bool_(True), new_ok, merge_ok, split_ok])
    noise = jax.random.uniform(key, (4,))
    op = _lex_argmax(utilities, noise, noise, valid)
    return op, utilities[op]
