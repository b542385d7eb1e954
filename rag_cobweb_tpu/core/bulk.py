"""Frozen-epoch bulk insert: amortize the sequential descent latency.

The exact insert path (core/tree.py) is latency-bound: each instance's
descent is a serial chain of ~depth small device steps (~1 ms/insert on
v5e regardless of vector width).  This module trades strict one-at-a-time
semantics for throughput, the way SURVEY.md §7 stage 6 plans ("chunked
inserts with conflict handling; validate recall parity under permuted
insert order — measure, don't assume"):

  * all M instances of a chunk run a *read-only* descent against the state
    frozen at chunk start — ONE vmapped device call;
  * statistic updates compose exactly: every visited node receives the
    Chan-merge of its frozen stats with the batch stats of the instances
    that passed through it (order-free, numerically equivalent to any
    sequential interleaving);
  * structural effects (new leaf, fringe split) compose per parent row;
    instances whose descent chose merge/split, overflowed a fanout block,
    or collided on the same leaf fall back to the exact sequential path;
  * decisions within a chunk do not see each other's updates — the
    approximation.  Recall parity is validated in tests/test_bulk.py and
    measured in the bench.

Typical conflict/fallback rate on clustered data is a few percent, so the
effective throughput approaches (chunk descent + compose) / M.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.core.tree import NULL, TreeState
from rag_cobweb_tpu.ops import opscore
from rag_cobweb_tpu.ops.gaussian import welford_insert

OP_ABSORB, OP_NEW, OP_FRINGE, OP_FALLBACK = 0, 1, 2, 3


def _bucket(n: int, lo: int = 64) -> int:
    """Power-of-two size bucketing so jitted helpers compile a handful of
    shapes instead of one per chunk."""
    return max(lo, 1 << max(n - 1, 1).bit_length())


def _pad_i32(a: np.ndarray, size: int, fill=-1) -> np.ndarray:
    out = np.full((size,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


class FrozenDescent(NamedTuple):
    visited: jnp.ndarray   # (S,) nodes this instance increments (-1 pad)
    op: jnp.ndarray        # () terminal op code
    parent: jnp.ndarray    # () parent node of the terminal op
    target: jnp.ndarray    # () leaf for absorb/fringe, -1 otherwise


def _descend_frozen(st: TreeState, x, key, cfg: TreeConfig,
                    max_steps: int = 16) -> FrozenDescent:
    """Read-only descent against frozen state.  Records the increment path
    and the terminal op; merge/split (or an over-deep descent) flags the
    instance for the exact fallback path."""
    F = st.fanout

    def cond(c):
        view, steps, visited, done, op, parent, target = c
        return (~done) & (steps < max_steps)

    def body(c):
        view, steps, visited, done, op, parent, target = c
        step_key = jax.random.fold_in(key, steps)
        is_leaf = view.n == 0

        def leaf_case(_):
            count = view.stats.count
            safe = jnp.maximum(count, 1.0)
            std = jnp.sqrt(view.stats.m2 / safe)
            exact = (count > 0) \
                & jnp.all(jnp.isclose(std, 0.0, rtol=1e-5, atol=1e-8)) \
                & jnp.all(jnp.isclose(x, view.stats.mean,
                                      rtol=1e-5, atol=1e-8))
            absorb = exact | (count == 0.0)
            # absorb: the leaf itself is incremented; fringe: it is not
            new_visited = jnp.where(
                absorb, visited.at[steps].set(view.cur), visited
            )
            return (view, new_visited, jnp.bool_(True),
                    jnp.where(absorb, OP_ABSORB, OP_FRINGE),
                    view.parent, view.cur)

        def internal_case(_):
            k_two, k_op = jax.random.split(step_key)
            child_idx = view.row
            mask = child_idx >= 0
            children = tree_mod._gather_stats(st, child_idx)
            tb = opscore.two_best_children(x, view.stats, children, mask,
                                           cfg, k_two)
            b1_node = child_idx[tb.best1]
            gc_idx = st.children[b1_node]
            gc_mask = gc_idx >= 0
            grandchildren = tree_mod._gather_stats(st, gc_idx)
            nc = view.n
            if cfg.greedy:
                o = jnp.int32(opscore.OP_NEW)
            else:
                o, _ = opscore.best_operation(
                    x, view.stats, children, mask, tb, grandchildren,
                    gc_mask, cfg, k_op, nc >= F,
                    (nc - 1 + st.n_children[b1_node]) <= F,
                )
            is_best = o == opscore.OP_BEST
            is_new = o == opscore.OP_NEW
            # merge/split -> fallback (structural decisions too entangled
            # to compose against a frozen epoch)
            new_visited = jnp.where(
                is_best | is_new, visited.at[steps].set(view.cur), visited
            )
            nxt = tree_mod._view_from_state(st, b1_node)._replace(
                parent=view.cur, prev_row=view.row, prev_n=view.n
            )
            return (
                jax.tree.map(lambda a, b: jnp.where(
                    jnp.reshape(is_best, (1,) * a.ndim)
                    if a.ndim else is_best, a, b), nxt, view),
                new_visited,
                ~is_best,
                jnp.where(is_new, OP_NEW, OP_FALLBACK),
                view.cur,
                NULL,
            )

        # compute both + select (see core/tree.py note: a batched-pred cond
        # broadcasts closed-over state arrays per vmap lane)
        lc = leaf_case(None)
        ic = internal_case(None)

        def pick(a, b):
            cond = jnp.reshape(is_leaf, (1,) * a.ndim) if a.ndim else is_leaf
            return jnp.where(cond, a, b)

        view2, visited2, done2, op2, parent2, target2 = jax.tree.map(
            pick, lc, ic
        )
        return (view2, steps + 1, visited2, done2, op2, parent2, target2)

    view0 = tree_mod._view_from_state(st, st.root)
    init = (view0, jnp.zeros((), jnp.int32),
            jnp.full((max_steps,), NULL, jnp.int32), jnp.bool_(False),
            jnp.int32(OP_FALLBACK), NULL, NULL)
    view, steps, visited, done, op, parent, target = jax.lax.while_loop(
        cond, body, init
    )
    op = jnp.where(done, op, OP_FALLBACK)  # over-deep descent -> fallback
    return FrozenDescent(visited=visited, op=op, parent=parent,
                         target=target)


@functools.partial(jax.jit, static_argnames=("cfg",))
def descend_frozen_batch(st: TreeState, xs, keys, cfg: TreeConfig):
    return jax.vmap(lambda x, k: _descend_frozen(st, x, k, cfg))(xs, keys)


@functools.partial(jax.jit, static_argnames=())
def _gather_rows(st: TreeState, idx):
    """Fetch (counts, means, m2s, children, n_children, parent) rows."""
    safe = jnp.maximum(idx, 0)
    return (st.counts[safe], st.means[safe], st.m2s[safe],
            st.children[safe], st.n_children[safe], st.parent[safe])


@jax.jit
def _apply_bulk(st: TreeState, stat_idx, stat_count, stat_mean, stat_m2,
                crow_idx, crow_vals, crow_n, par_idx, par_val, n_new):
    cap = st.counts.shape[0]
    si = jnp.where(stat_idx >= 0, stat_idx, cap)
    st = st._replace(
        counts=st.counts.at[si].set(stat_count, mode="drop"),
        means=st.means.at[si].set(stat_mean, mode="drop"),
        m2s=st.m2s.at[si].set(stat_m2, mode="drop"),
    )
    ci = jnp.where(crow_idx >= 0, crow_idx, cap)
    st = st._replace(
        children=st.children.at[ci].set(crow_vals, mode="drop"),
        n_children=st.n_children.at[ci].set(crow_n, mode="drop"),
    )
    pi = jnp.where(par_idx >= 0, par_idx, cap)
    st = st._replace(parent=st.parent.at[pi].set(par_val, mode="drop"))
    return st._replace(n_alloc=st.n_alloc + n_new)


def bulk_insert(tree, xs: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Insert ``xs`` in frozen-epoch chunks.  Returns leaf ids per instance.

    ``tree`` is a core.tree.CobwebTree; conflicted / structural-op
    instances are re-inserted through ``tree.fit`` (exact path).
    """
    xs = np.asarray(xs, np.float32)
    cfg: TreeConfig = tree.cfg
    leaves_out = np.full((len(xs),), -1, np.int64)

    for s0 in range(0, len(xs), chunk):
        cx = xs[s0:s0 + chunk]
        M = len(cx)
        tree._ensure_capacity(M)
        keys = tree._next_keys(M)
        fd = descend_frozen_batch(tree.state, jnp.asarray(cx), keys, cfg)
        visited = np.asarray(fd.visited)          # (M, S)
        ops = np.asarray(fd.op)
        parents = np.asarray(fd.parent)
        targets = np.asarray(fd.target)

        fallback = ops == OP_FALLBACK
        # leaf-collision policy: concurrent absorbs on a leaf compose
        # exactly (same stat aggregation); any fringe on a leaf conflicts
        # with every other terminal op on it — first wins, rest fall back
        seen: dict[int, int] = {}   # leaf -> first op kind
        for i in range(M):
            if fallback[i]:
                continue
            op_i = int(ops[i])
            if op_i not in (OP_ABSORB, OP_FRINGE):
                continue
            t = int(targets[i])
            prev = seen.get(t)
            if prev is None:
                seen[t] = op_i
            elif prev == OP_ABSORB and op_i == OP_ABSORB:
                pass  # exact composition
            else:
                fallback[i] = True

        # per-parent structural composition for new/fringe
        st_host_needed = np.unique(np.concatenate([
            visited[visited >= 0].ravel(),
            parents[(ops == OP_NEW) | (ops == OP_FRINGE)],
            targets[ops == OP_FRINGE],
        ])) if M else np.zeros((0,), np.int64)
        st_host_needed = st_host_needed[st_host_needed >= 0].astype(np.int32)
        padded_need = _pad_i32(st_host_needed, _bucket(len(st_host_needed)),
                               fill=0)
        g_counts, g_means, g_m2s, g_children, g_nchildren, g_parent = (
            np.asarray(a) for a in _gather_rows(
                tree.state, jnp.asarray(padded_need))
        )
        lut = {int(n): j for j, n in enumerate(st_host_needed)}

        F = cfg.max_fanout
        n_alloc0 = int(np.asarray(tree.state.n_alloc))
        next_new = n_alloc0
        new_stats: list[tuple] = []        # (node, count, mean, m2)
        row_edit: dict[int, np.ndarray] = {}
        row_n: dict[int, int] = {}
        par_updates: list[tuple] = []
        leaf_of = np.full((M,), -1, np.int64)
        # stat contribution bookkeeping: visited rows of fallback instances
        # must NOT contribute (they will re-run exactly)
        for i in range(M):
            if fallback[i]:
                continue
            op = int(ops[i])
            if op == OP_ABSORB:
                leaf_of[i] = int(targets[i])
                continue
            P = int(parents[i])
            if op == OP_NEW:
                if P not in row_edit:
                    j = lut[P]
                    row_edit[P] = g_children[j].copy()
                    row_n[P] = int(g_nchildren[j])
                if row_n[P] >= F:
                    fallback[i] = True
                    continue
                leaf = next_new
                next_new += 1
                row_edit[P][row_n[P]] = leaf
                row_n[P] += 1
                new_stats.append((leaf, 1.0, cx[i], np.zeros_like(cx[i])))
                row_edit[leaf] = np.full((F,), -1, np.int32)
                row_n[leaf] = 0
                par_updates.append((leaf, P))
                leaf_of[i] = leaf
            elif op == OP_FRINGE:
                L = int(targets[i])
                jL = lut[L]
                p_new, leaf = next_new, next_new + 1
                next_new += 2
                # p_new = frozen L stats + x  (welford)
                c0 = float(g_counts[jL])
                mu0 = g_means[jL].astype(np.float64)
                m20 = g_m2s[jL].astype(np.float64)
                c1 = c0 + 1.0
                delta = cx[i] - mu0
                mu1 = mu0 + delta / c1
                m21 = m20 + delta * (cx[i] - mu1)
                new_stats.append((p_new, c1, mu1.astype(np.float32),
                                  m21.astype(np.float32)))
                new_stats.append((leaf, 1.0, cx[i], np.zeros_like(cx[i])))
                p_row = np.full((F,), -1, np.int32)
                p_row[0], p_row[1] = L, leaf
                row_edit[p_new] = p_row
                row_n[p_new] = 2
                row_edit[leaf] = np.full((F,), -1, np.int32)
                row_n[leaf] = 0
                par_updates += [(p_new, P), (L, p_new), (leaf, p_new)]
                if P >= 0:
                    if P not in row_edit:
                        j = lut[P]
                        row_edit[P] = g_children[j].copy()
                        row_n[P] = int(g_nchildren[j])
                    row_edit[P][row_edit[P] == L] = p_new
                else:
                    # leaf WAS the root (degenerate tiny tree)
                    tree.state = tree.state._replace(
                        root=jnp.asarray(p_new, jnp.int32)
                    )
                leaf_of[i] = leaf

        # ---- exact order-free stat aggregation over visited nodes ----
        ok = ~fallback
        vis = visited[ok]                          # (Mok, S)
        inst = np.repeat(np.arange(M)[ok], vis.shape[1] if vis.size else 0)
        flat = vis.ravel()
        keep = flat >= 0
        flat, inst = flat[keep], inst[keep]
        stat_rows: list[tuple] = []
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            T = len(uniq)
            n_b = np.zeros((T,), np.float64)
            s_b = np.zeros((T, cx.shape[1]), np.float64)
            q_b = np.zeros((T, cx.shape[1]), np.float64)
            np.add.at(n_b, inv, 1.0)
            np.add.at(s_b, inv, cx[inst].astype(np.float64))
            np.add.at(q_b, inv, (cx[inst].astype(np.float64)) ** 2)
            mean_b = s_b / n_b[:, None]
            m2_b = q_b - n_b[:, None] * mean_b ** 2
            for j, node in enumerate(uniq):
                g = lut[int(node)]
                c0, mu0 = float(g_counts[g]), g_means[g].astype(np.float64)
                m20 = g_m2s[g].astype(np.float64)
                tot = c0 + n_b[j]
                d = mean_b[j] - mu0
                m2 = m20 + m2_b[j] + d * d * (c0 * n_b[j] / tot)
                mu = (c0 * mu0 + n_b[j] * mean_b[j]) / tot
                stat_rows.append((int(node), tot, mu.astype(np.float32),
                                  m2.astype(np.float32)))

        stat_rows += new_stats
        n_new = next_new - n_alloc0
        tree._ensure_capacity(n_new // 2 + 1)

        if stat_rows or row_edit or par_updates:
            D = cx.shape[1]
            sidx = np.asarray([r[0] for r in stat_rows], np.int32) \
                if stat_rows else np.zeros((0,), np.int32)
            scount = np.asarray([r[1] for r in stat_rows], np.float32) \
                if stat_rows else np.zeros((0,), np.float32)
            smean = np.stack([r[2] for r in stat_rows]).astype(np.float32) \
                if stat_rows else np.zeros((0, D), np.float32)
            sm2 = np.stack([r[3] for r in stat_rows]).astype(np.float32) \
                if stat_rows else np.zeros((0, D), np.float32)
            cidx = np.asarray(list(row_edit), np.int32)
            cvals = np.stack([row_edit[int(i)] for i in cidx]).astype(
                np.int32) if len(cidx) else np.zeros((0, F), np.int32)
            cn = np.asarray([row_n[int(i)] for i in cidx], np.int32) \
                if len(cidx) else np.zeros((0,), np.int32)
            pidx = np.asarray([p[0] for p in par_updates], np.int32) \
                if par_updates else np.zeros((0,), np.int32)
            pval = np.asarray([p[1] for p in par_updates], np.int32) \
                if par_updates else np.zeros((0,), np.int32)
            # bucket to stable shapes (padding routed OOB by _apply_bulk)
            bs = _bucket(len(sidx))
            bc = _bucket(len(cidx), lo=16)
            bp = _bucket(len(pidx), lo=16)
            tree.state = _apply_bulk(
                tree.state,
                jnp.asarray(_pad_i32(sidx, bs)),
                jnp.asarray(_pad_i32(scount, bs, 0.0)),
                jnp.asarray(_pad_i32(smean, bs, 0.0)),
                jnp.asarray(_pad_i32(sm2, bs, 0.0)),
                jnp.asarray(_pad_i32(cidx, bc)),
                jnp.asarray(_pad_i32(cvals, bc)),
                jnp.asarray(_pad_i32(cn, bc, 0)),
                jnp.asarray(_pad_i32(pidx, bp)),
                jnp.asarray(_pad_i32(pval, bp)),
                jnp.asarray(n_new, jnp.int32),
            )
        tree.n_inserted += int((~fallback).sum())

        # ---- exact fallback for conflicted / structural instances ----
        if fallback.any():
            fb = np.where(fallback)[0]
            fb_leaves = tree.fit(cx[fb])
            leaf_of[fb] = fb_leaves
        leaves_out[s0:s0 + M] = leaf_of
    return leaves_out
