"""Frozen-epoch bulk insert: amortize the sequential descent latency.

The exact insert path (core/tree.py) is latency-bound: each instance's
descent is a serial chain of ~depth small device steps (~1 ms/insert on
v5e regardless of vector width).  This module trades strict one-at-a-time
semantics for throughput, the way SURVEY.md §7 stage 6 plans ("chunked
inserts with conflict handling; validate recall parity under permuted
insert order — measure, don't assume"):

  * all M instances of a chunk run the full deferred descent
    (core/tree._descend_collect) against the state frozen at chunk start —
    ONE vmapped device call (~29k descents/s on v5e), recording every
    step's structural effects INCLUDING merges, splits and fringe splits;
  * statistic updates compose exactly: every node receives the Chan-merge
    of its base stats with the batch statistics of the instances that
    incremented it (order-free — mathematically identical to any
    sequential interleaving of Welford updates);
  * structural effects replay per accepted instance; an instance is
    accepted only if its *snapshot sources* (nodes whose frozen stats it
    baked into a merge node or fringe parent, plus split-freed nodes) are
    untouched by every other accepted instance and its row edits don't
    collide — otherwise it falls back to the exact sequential path;
  * decisions within a chunk do not see each other's updates — the
    approximation.  Recall parity is validated in tests/test_bulk.py and
    at benchmark scale (identical recall@10 at c=10000).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.core.tree import TreeState


def _bucket(n: int, lo: int = 64) -> int:
    """Power-of-two size bucketing so jitted helpers compile a handful of
    shapes instead of one per chunk."""
    return max(lo, 1 << max(n - 1, 1).bit_length())


def _pad(a: np.ndarray, size: int, fill) -> np.ndarray:
    out = np.full((size,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def _collect_chunk(st: TreeState, xs, keys, cfg: TreeConfig,
                   max_steps: int = 16):
    """vmapped deferred descent against frozen state with bump-only slot
    allocation (free_top forced to 0, so every instance draws the same
    deterministic virtual id sequence n_alloc0, n_alloc0+1, ... — remapped
    per instance on the host).

    All small delta fields are packed into ONE int32 buffer so the host
    pulls a single array over the (high-latency) device link.
    """
    st0 = st._replace(free_top=jnp.zeros((), jnp.int32))
    F = st.fanout

    def one(x, k):
        dbuf, steps, leaf = tree_mod._descend_collect(
            st0, x, k, cfg, max_steps=max_steps
        )
        packed = jnp.concatenate([
            dbuf.stat_idx,                                 # 3
            dbuf.crow_idx,                                 # 3
            dbuf.crow_vals.reshape(max_steps, 3 * F),      # 3F
            dbuf.crow_n,                                   # 3
            dbuf.par_idx,                                  # F+3
            dbuf.par_val,                                  # F+3
            dbuf.free_node[:, None],                       # 1
            dbuf.slots_used[:, None],                      # 1
            dbuf.done[:, None].astype(jnp.int32),          # 1
            dbuf.root[:, None],                            # 1
        ], axis=1)
        return packed, steps, leaf

    return jax.vmap(one)(xs, keys)


def _unpack(packed: np.ndarray, F: int) -> dict:
    o = 0

    def take(n):
        nonlocal o
        out = packed[..., o:o + n]
        o += n
        return out

    return {
        "stat_idx": take(3),
        "crow_idx": take(3),
        "crow_vals": take(3 * F).reshape(packed.shape[0], packed.shape[1],
                                         3, F),
        "crow_n": take(3),
        "par_idx": take(F + 3),
        "par_val": take(F + 3),
        "free_node": take(1)[..., 0],
        "slots_used": take(1)[..., 0],
        "done": take(1)[..., 0].astype(bool),
        "root": take(1)[..., 0],
    }


@functools.partial(jax.jit, static_argnames=())
def _gather_rows(st: TreeState, idx):
    safe = jnp.maximum(idx, 0)
    return (st.counts[safe], st.means[safe], st.m2s[safe],
            st.children[safe], st.n_children[safe])


@jax.jit
def _apply_bulk(st: TreeState, stat_idx, stat_count, stat_mean, stat_m2,
                crow_idx, crow_vals, crow_n, par_idx, par_val,
                free_nodes, n_free, n_new, new_root):
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
    # push split-freed nodes onto the free stack
    lane = jnp.arange(free_nodes.shape[0])
    pos = jnp.where(lane < n_free, st.free_top + lane, cap)
    st = st._replace(
        free_stack=st.free_stack.at[pos].set(free_nodes, mode="drop"),
        free_top=st.free_top + n_free,
        n_alloc=st.n_alloc + n_new,
        root=jnp.where(new_root >= 0, new_root, st.root),
    )
    return st


def bulk_insert(tree, xs: np.ndarray, chunk: int = 2048,
                max_steps: int = 16) -> np.ndarray:
    """Insert ``xs`` in frozen-epoch chunks.  Returns leaf ids per instance.

    ``tree`` is a core.tree.CobwebTree; conflicted or over-deep instances
    are re-inserted through ``tree.fit`` (exact path).
    """
    xs = np.asarray(xs, np.float32)
    cfg: TreeConfig = tree.cfg
    F = cfg.max_fanout
    leaves_out = np.full((len(xs),), -1, np.int64)

    for s0 in range(0, len(xs), chunk):
        cx = xs[s0:s0 + chunk]
        M = len(cx)
        tree._ensure_capacity(2 * M)
        keys = tree._next_keys(M)
        packed, steps, leaves = _collect_chunk(
            tree.state, jnp.asarray(cx), keys, cfg, max_steps=max_steps
        )
        small = _unpack(np.asarray(packed), F)   # ONE device->host pull
        steps = np.asarray(steps)
        leaves = np.asarray(leaves)
        n_alloc0 = int(np.asarray(tree.state.n_alloc))

        slots_used = small["slots_used"]        # (M, S)
        free_node = small["free_node"]
        done = small["done"]
        alloc_per_inst = slots_used.sum(axis=1)
        offsets = np.zeros((M,), np.int64)

        def remap(v, i):
            """virtual fresh ids (>= n_alloc0) -> this instance's global ids"""
            v = np.asarray(v)
            return np.where(v >= n_alloc0, v + offsets[i], v)

        def remap_all(arr):
            """vectorized remap over a (M, S, ...) field."""
            off = offsets.reshape((M,) + (1,) * (arr.ndim - 1))
            return np.where(arr >= n_alloc0, arr + off, arr)

        def exist(n):
            return 0 <= n < n_alloc0

        # ---- pre-scan: classify every instance's steps -----------------
        recs = []
        all_candidates: set = set()
        for i in range(M):
            n_steps = int(steps[i])
            if leaves[i] < 0 or n_steps == 0:
                recs.append(None)
                continue
            rec = {"incr": set(), "src": set(), "freed": set(),
                   "rewr": set(), "splice": [], "append": []}
            for t in range(n_steps):
                su = int(slots_used[i, t])
                dn = bool(done[i, t])
                fn = int(free_node[i, t])
                sidx = small["stat_idx"][i, t]
                cidx = small["crow_idx"][i, t]
                cvals = small["crow_vals"][i, t]
                if fn >= 0:                       # split
                    rec["src"].add(fn)
                    rec["freed"].add(fn)
                    if exist(int(cidx[0])):
                        rec["rewr"].add(int(cidx[0]))
                elif su == 1 and not dn:          # merge
                    rec["incr"].add(int(sidx[0]))
                    rec["src"].add(int(cvals[1][0]))
                    rec["src"].add(int(cvals[1][1]))
                    if exist(int(cidx[0])):
                        rec["rewr"].add(int(cidx[0]))
                elif su == 1 and dn:              # new leaf at parent P
                    rec["incr"].add(int(sidx[0]))
                    P = int(cidx[0])
                    if exist(P) and P not in rec["rewr"]:
                        rec["append"].append((P, t))
                elif su == 2:                     # fringe split at leaf L
                    rec["src"].add(int(cvals[0][0]))
                    P = int(cidx[1])
                    if exist(P) and P not in rec["rewr"]:
                        rec["splice"].append((P, t))
                elif dn:                          # absorb
                    rec["incr"].add(int(sidx[0]))
                else:                             # best
                    rec["incr"].add(int(sidx[0]))
            recs.append(rec)
            all_candidates |= {n for n in rec["incr"] | rec["src"]
                               | rec["rewr"] if exist(n)}
            all_candidates |= {p for p, _ in rec["splice"]}
            all_candidates |= {p for p, _ in rec["append"]}

        # ---- one gather of frozen rows for all candidates --------------
        te = np.asarray(sorted(all_candidates), np.int32)
        te_pad = _pad(te, _bucket(max(len(te), 1)), 0)
        g_counts, g_means, g_m2s, g_children, g_nch = (
            np.asarray(a) for a in _gather_rows(
                tree.state, jnp.asarray(te_pad))
        )
        lut = {int(n): j for j, n in enumerate(te)}

        def base_of(node):
            j = lut[node]
            return (float(g_counts[j]), g_means[j].astype(np.float64),
                    g_m2s[j].astype(np.float64))

        # ---- acceptance: snapshot-source conflict rules, with shared
        # splice/append composition on untouched parents ------------------
        INCR: set = set()
        SRC: set = set()
        REWR: set = set()
        SHARED: set = set()
        FREED: set = set()
        append_cnt: dict = {}
        accepted = np.zeros((M,), bool)
        for i in range(M):
            rec = recs[i]
            if rec is None:
                continue
            incr_e = {n for n in rec["incr"] if exist(n)}
            src_e = {n for n in rec["src"] if exist(n)}
            freed_e = {n for n in rec["freed"] if exist(n)}
            shared_p = {p for p, _ in rec["splice"]} |                        {p for p, _ in rec["append"]}
            if (src_e & (INCR | SRC | REWR | SHARED))                     or (rec["rewr"] & (REWR | SHARED))                     or (shared_p & (REWR | SRC | FREED))                     or (incr_e & (SRC | FREED))                     or (freed_e & (INCR | SRC | REWR | SHARED)):
                continue
            # fanout capacity across composed appends
            ok = True
            local_cnt: dict = {}
            for p, _ in rec["append"]:
                local_cnt[p] = local_cnt.get(p, 0) + 1
            for p, c in local_cnt.items():
                if int(g_nch[lut[p]]) + append_cnt.get(p, 0) + c > F:
                    ok = False
                    break
            if not ok:
                continue
            accepted[i] = True
            INCR |= incr_e
            SRC |= src_e
            REWR |= rec["rewr"]
            SHARED |= shared_p
            FREED |= freed_e
            for p, c in local_cnt.items():
                append_cnt[p] = append_cnt.get(p, 0) + c

        run = 0
        for i in range(M):
            if accepted[i]:
                offsets[i] = run
                run += int(alloc_per_inst[i])
        n_new = run
        fallback = ~accepted
        tree._ensure_capacity(n_new // 2 + 1)

        if accepted.any():
            incr_pairs: list[tuple[int, int]] = []   # (node, instance)
            fresh_base: dict[int, tuple] = {}
            row_final: dict[int, np.ndarray] = {}
            rown_final: dict[int, int] = {}
            par_final: dict[int, int] = {}
            shared_splices: dict[int, list] = {}     # P -> [(L, p_new_g)]
            shared_appends: dict[int, list] = {}     # P -> [leaf_g]
            freed_all: list[int] = []
            new_root = -1
            D = cx.shape[1]
            stat_g = remap_all(small["stat_idx"])
            free_g = remap_all(small["free_node"])
            cidx_g = remap_all(small["crow_idx"])
            cvals_g = remap_all(small["crow_vals"])
            pidx_g = remap_all(small["par_idx"])
            pval_g = remap_all(small["par_val"])
            root_g = remap_all(small["root"])
            for i in range(M):
                if not accepted[i]:
                    continue
                rec = recs[i]
                append_steps = {tt for _, tt in rec["append"]}
                splice_steps = {tt for _, tt in rec["splice"]}
                n_steps = int(steps[i])
                for t in range(n_steps):
                    su = int(slots_used[i, t])
                    dn = bool(done[i, t])
                    fn = int(free_node[i, t])
                    sidx = stat_g[i, t]
                    cidx = cidx_g[i, t]
                    cvals = cvals_g[i, t]
                    cn = small["crow_n"][i, t]
                    pidx = pidx_g[i, t]
                    pval = pval_g[i, t]
                    rt = int(root_g[i, t])
                    if rt >= 0:
                        new_root = rt
                    is_new = su == 1 and dn and fn < 0
                    is_fringe = su == 2
                    shared_new = is_new and t in append_steps
                    shared_fringe = is_fringe and t in splice_steps
                    for j in range(3):
                        if cidx[j] < 0:
                            continue
                        if j == 0 and shared_new:
                            continue          # composed below
                        if j == 1 and shared_fringe:
                            continue          # composed below
                        row_final[int(cidx[j])] = cvals[j].copy()
                        rown_final[int(cidx[j])] = int(cn[j])
                    for j in range(len(pidx)):
                        if pidx[j] >= 0:
                            par_final[int(pidx[j])] = int(pval[j])
                    if fn >= 0:                   # split: no stat writes
                        freed_all.append(int(free_g[i, t]))
                        continue
                    if is_fringe:                 # fringe: p_new + leaf
                        p_new, leaf = int(sidx[0]), int(sidx[1])
                        L = int(cvals[0][0])
                        fresh_base[p_new] = base_of(L)
                        incr_pairs.append((p_new, i))
                        fresh_base[leaf] = (
                            0.0, np.zeros((D,), np.float64),
                            np.zeros((D,), np.float64),
                        )
                        incr_pairs.append((leaf, i))
                        if shared_fringe:
                            shared_splices.setdefault(
                                int(cidx[1]), []).append((L, p_new))
                    elif su == 1 and not dn:      # merge: cur inc + M base
                        incr_pairs.append((int(sidx[0]), i))
                        m = int(sidx[1])
                        b1, b2 = int(cvals[1][0]), int(cvals[1][1])
                        c1, mu1, m21 = (fresh_base[b1] if b1 in fresh_base
                                        else base_of(b1))
                        c2, mu2, m22 = (fresh_base[b2] if b2 in fresh_base
                                        else base_of(b2))
                        tot = c1 + c2
                        d = mu2 - mu1
                        fresh_base[m] = (
                            tot,
                            (c1 * mu1 + c2 * mu2) / tot,
                            m21 + m22 + d * d * (c1 * c2 / tot),
                        )
                    elif is_new:                  # new leaf
                        incr_pairs.append((int(sidx[0]), i))
                        leaf = int(sidx[1])
                        fresh_base[leaf] = (
                            0.0, np.zeros((D,), np.float64),
                            np.zeros((D,), np.float64),
                        )
                        incr_pairs.append((leaf, i))
                        if shared_new:
                            shared_appends.setdefault(
                                int(cidx[0]), []).append(leaf)
                    else:                          # best / absorb
                        incr_pairs.append((int(sidx[0]), i))

            # composed shared-parent rows (frozen base + splices + appends)
            for P in set(shared_splices) | set(shared_appends):
                row = g_children[lut[P]].copy().astype(np.int64)
                n = int(g_nch[lut[P]])
                for L, p_new in shared_splices.get(P, []):
                    row[row == L] = p_new
                for leaf in shared_appends.get(P, []):
                    row[n] = leaf
                    n += 1
                row_final[P] = row
                rown_final[P] = n

            # ---- exact order-free stat aggregation ----
            stat_rows: list[tuple] = []
            contributed: set = set()
            if incr_pairs:
                nodes = np.asarray([p[0] for p in incr_pairs], np.int64)
                insts = np.asarray([p[1] for p in incr_pairs], np.int64)
                uniq, inv = np.unique(nodes, return_inverse=True)
                T = len(uniq)
                n_b = np.zeros((T,), np.float64)
                s_b = np.zeros((T, D), np.float64)
                q_b = np.zeros((T, D), np.float64)
                xv = cx[insts].astype(np.float64)
                np.add.at(n_b, inv, 1.0)
                np.add.at(s_b, inv, xv)
                np.add.at(q_b, inv, xv * xv)
                mean_b = s_b / n_b[:, None]
                m2_b = q_b - n_b[:, None] * mean_b ** 2
                m2_b = np.maximum(m2_b, 0.0)
                for j, node in enumerate(uniq):
                    node = int(node)
                    contributed.add(node)
                    if node in fresh_base:
                        c0, mu0, m20 = fresh_base[node]
                    else:
                        c0, mu0, m20 = base_of(node)
                    tot = c0 + n_b[j]
                    if c0 > 0:
                        d = mean_b[j] - mu0
                        m2 = m20 + m2_b[j] + d * d * (c0 * n_b[j] / tot)
                        mu = (c0 * mu0 + n_b[j] * mean_b[j]) / tot
                    else:
                        mu, m2 = mean_b[j], m2_b[j]
                    stat_rows.append((node, tot, mu, m2))
            # fresh nodes that never received an increment (merge nodes the
            # creator immediately split, etc.) still need their base written
            for node, (c0, mu0, m20) in fresh_base.items():
                if node not in contributed:
                    stat_rows.append((node, c0, mu0, m20))

            # ---- device apply ----
            sidx = np.asarray([r[0] for r in stat_rows], np.int32)
            scount = np.asarray([r[1] for r in stat_rows], np.float32)
            smean = np.stack([r[2] for r in stat_rows]).astype(np.float32)
            sm2 = np.stack([r[3] for r in stat_rows]).astype(np.float32)
            cidx_a = np.asarray(list(row_final), np.int32)
            cvals_a = (np.stack([row_final[int(n)] for n in cidx_a])
                       .astype(np.int32) if len(cidx_a)
                       else np.zeros((0, F), np.int32))
            cn_a = (np.asarray([rown_final[int(n)] for n in cidx_a],
                               np.int32) if len(cidx_a)
                    else np.zeros((0,), np.int32))
            pidx_a = np.asarray(list(par_final), np.int32)
            pval_a = (np.asarray([par_final[int(n)] for n in pidx_a],
                                 np.int32) if len(pidx_a)
                      else np.zeros((0,), np.int32))
            fr = np.asarray(freed_all, np.int32)

            bs, bc = _bucket(len(sidx)), _bucket(len(cidx_a), lo=16)
            bp, bf = _bucket(len(pidx_a), lo=16), _bucket(len(fr), lo=16)
            tree.state = _apply_bulk(
                tree.state,
                jnp.asarray(_pad(sidx, bs, -1)),
                jnp.asarray(_pad(scount, bs, 0.0)),
                jnp.asarray(_pad(smean, bs, 0.0)),
                jnp.asarray(_pad(sm2, bs, 0.0)),
                jnp.asarray(_pad(cidx_a, bc, -1)),
                jnp.asarray(_pad(cvals_a, bc, -1)),
                jnp.asarray(_pad(cn_a, bc, 0)),
                jnp.asarray(_pad(pidx_a, bp, -1)),
                jnp.asarray(_pad(pval_a, bp, -1)),
                jnp.asarray(_pad(fr, bf, -1)),
                jnp.asarray(len(fr), jnp.int32),
                jnp.asarray(n_new, jnp.int32),
                jnp.asarray(new_root, jnp.int32),
            )
            tree.n_inserted += int(accepted.sum())
            leaves_g = np.where(leaves >= n_alloc0, leaves + offsets,
                                leaves)
            leaves_out[s0:s0 + M][accepted] = leaves_g[accepted]

        # ---- exact fallback for conflicted instances ----
        if fallback.any():
            fb = np.where(fallback)[0]
            fb_leaves = tree.fit(cx[fb])
            leaves_out[s0 + fb] = fb_leaves
    return leaves_out
