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
  * statistic updates compose exactly: every node receives the batch
    composition of its frozen stats with all accepted instances'
    increments, computed as sums centered at the node's frozen mean
    (order-free — mathematically identical to any sequential interleaving
    of Welford updates);
  * structural effects replay per accepted instance; an instance is
    accepted only if its *snapshot sources* (nodes whose frozen stats it
    baked into a merge node or fringe parent, plus split-freed nodes) are
    untouched by every other instance and its row edits don't collide;
  * rejected instances are NOT immediately re-inserted through the exact
    path: they re-descend against the *updated* state in the next WAVE
    (the descent is two orders of magnitude cheaper than an exact insert),
    so only the tiny multiply-conflicted tail pays the sequential price;
  * classification, conflict detection, and delta composition are all
    vectorized numpy over the packed delta buffer (one device->host
    transfer per wave) — no per-instance host Python;
  * decisions within a wave do not see each other's updates — the
    approximation.  Recall parity is validated in tests/test_bulk.py and
    at benchmark scale (identical recall@10 at c=10000).

Replaces the reference's per-item Python loop
(/root/reference/src/cobweb/CobwebWrapper.py:69-77).
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
        dbuf, steps, leaf = tree_mod._descend_collect_scan(
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


# claim type codes.  FREED folds into SRC (every freed node is also a
# snapshot source).  The conflict sets mirror the sequential acceptance
# rules exactly; they are directional — a pair is incompatible iff at
# least one side lists the other, which suffices to keep any two accepted
# instances mutually composable.
_INCR, _SRC, _REWR, _SHARED = 0, 1, 2, 3
_CONF_SETS = {
    _INCR: (_SRC,),
    _SRC: (_INCR, _SRC, _REWR, _SHARED),
    _REWR: (_REWR, _SHARED),
    _SHARED: (_SRC, _REWR),
}


def _keep_last(idx: np.ndarray):
    """Positions of the last occurrence of each unique value, preserving
    within-array ordering semantics (later writes win)."""
    if len(idx) == 0:
        return np.zeros((0,), np.int64)
    rev = idx[::-1]
    _, first_rev = np.unique(rev, return_index=True)
    return np.sort(len(idx) - 1 - first_rev)


_TRACE = False


def _tr(label, t0):
    if _TRACE:
        import time
        print(f"    [bulk] {label}: {time.time() - t0:.3f}s", flush=True)
        return time.time()
    return t0


def _bulk_wave(tree, cx: np.ndarray, max_steps: int):
    """One frozen-epoch wave over ``cx``: collect, vectorized acceptance,
    composed apply.  Returns (accepted mask (m,), global leaf ids of the
    accepted instances, in their ``cx`` order)."""
    import time
    _tt = time.time() if _TRACE else 0
    cfg: TreeConfig = tree.cfg
    F = cfg.max_fanout
    m = len(cx)
    bucket = _bucket(m)
    tree._ensure_capacity(2 * bucket)
    keys = tree._next_keys(bucket)
    packed, steps, leaves = _collect_chunk(
        tree.state, jnp.asarray(_pad(cx, bucket, np.float32(0.0))), keys,
        cfg, max_steps=max_steps,
    )
    packed.block_until_ready()
    _tt = _tr("collect", _tt)
    small = _unpack(np.asarray(packed), F)       # ONE device->host pull
    _tt = _tr("transfer", _tt)
    steps = np.asarray(steps)
    leaves = np.asarray(leaves).astype(np.int64)
    n_alloc0 = int(np.asarray(tree.state.n_alloc))
    M, S = small["done"].shape

    # ---- step classification (vectorized) -------------------------------
    real = np.arange(M) < m
    valid = real & (leaves >= 0) & (steps > 0)
    sv = (np.arange(S)[None, :] < steps[:, None]) & valid[:, None]
    fn = small["free_node"]
    su = small["slots_used"]
    dn = small["done"]
    is_split = sv & (fn >= 0)
    nsp = sv & (fn < 0)
    is_merge = nsp & (su == 1) & ~dn
    is_new = nsp & (su == 1) & dn
    is_fringe = nsp & (su == 2)
    is_absorb = nsp & (su == 0) & dn
    is_best = nsp & (su == 0) & ~dn

    cidx = small["crow_idx"]
    cvals = small["crow_vals"]
    sidx = small["stat_idx"]

    def exist(n):
        return (n >= 0) & (n < n_alloc0)

    # own-rewr matrix: children rows this instance rewrote (split/merge cur)
    rewr_mat = np.where((is_split | is_merge) & exist(cidx[:, :, 0]),
                        cidx[:, :, 0], -2)
    P_fr = cidx[:, :, 1]                         # fringe: spliced parent
    P_nw = cidx[:, :, 0]                         # new: appended parent
    own_fr = (P_fr[:, :, None] == rewr_mat[:, None, :]).any(-1)
    own_nw = (P_nw[:, :, None] == rewr_mat[:, None, :]).any(-1)
    splice_mask = is_fringe & exist(P_fr) & ~own_fr
    append_mask = is_new & exist(P_nw) & ~own_nw

    ii = np.broadcast_to(np.arange(M)[:, None], (M, S))

    def take(mask, nodes):
        k = mask & exist(nodes)
        return nodes[k].astype(np.int64), ii[k].astype(np.int64)

    incr_n, incr_i = take(is_merge | is_new | is_absorb | is_best,
                          sidx[:, :, 0])
    s1n, s1i = take(is_merge, cvals[:, :, 1, 0])
    s2n, s2i = take(is_merge, cvals[:, :, 1, 1])
    sfn, sfi = take(is_fringe, cvals[:, :, 0, 0])
    ssn, ssi = take(is_split, fn)
    rwn, rwi = take(is_split | is_merge, cidx[:, :, 0])
    shn, shi = take(splice_mask, P_fr)
    ahn, ahi = take(append_mask, P_nw)

    c_node = np.concatenate([incr_n, s1n, s2n, sfn, ssn, rwn, shn, ahn])
    c_inst = np.concatenate([incr_i, s1i, s2i, sfi, ssi, rwi, shi, ahi])
    c_type = np.concatenate([
        np.full(len(incr_n), _INCR), np.full(len(s1n), _SRC),
        np.full(len(s2n), _SRC), np.full(len(sfn), _SRC),
        np.full(len(ssn), _SRC), np.full(len(rwn), _REWR),
        np.full(len(shn), _SHARED), np.full(len(ahn), _SHARED),
    ]).astype(np.int64)

    # ---- one gather of frozen rows for every claimed/composed node ------
    # every node the compose reads a frozen row for is also claimed (merge
    # sources and fringe leaves are SRC, shared parents SHARED, old
    # increment targets INCR), so the claim set is the candidate set
    cand = np.unique(c_node)
    te = cand.astype(np.int32)
    te_pad = _pad(te, _bucket(max(len(te), 1)), np.int32(0))
    g_counts, g_means, g_m2s, g_children, g_nch = (
        np.asarray(a) for a in _gather_rows(tree.state, jnp.asarray(te_pad))
    )

    _tt = _tr("classify+gather", _tt)

    def lut(nodes):
        return np.searchsorted(cand, nodes)

    # ---- acceptance: vectorized emulation of sequential greedy ----------
    # Each instance is accepted iff none of its claims conflicts with a
    # claim of an *accepted* lower-priority-resolved instance — exactly the
    # reference-order greedy, computed by iterating:
    #   reject  i when a conflicting claim belongs to an ACCEPTED instance;
    #   accept  i when no conflicting claim of an alive (accepted or
    #           undecided) other instance has a smaller index;
    # the lowest-index undecided instance always resolves, so the loop
    # terminates; in practice it converges in a handful of iterations.
    bad = ~valid
    # defensively reject instances whose merge sources are fresh nodes
    # (cannot occur for a single descent, but composition assumes frozen)
    bad |= (is_merge & ((cvals[:, :, 1, 0] >= n_alloc0)
                        | (cvals[:, :, 1, 1] >= n_alloc0))).any(1)

    UND, ACC, REJ = 0, 1, 2
    status = np.full((M,), REJ, np.int8)
    status[valid & ~bad] = UND
    INF = np.int64(M + 1)

    # priority: merge/split instances claim mid-level nodes exclusively and
    # poison every instance that merely descends through them — give them
    # the lowest priority so plain increments commit first and the (few)
    # restructurers retry against the updated state next wave
    structural = (is_merge | is_split).any(1)
    rank_of = np.argsort(np.argsort(
        structural.astype(np.int64) * M + np.arange(M), kind="stable"))
    c_rank = rank_of[c_inst]

    if len(c_node):
        # acceptance runs in RANK space; rstatus mirrors status permuted
        inst_of = np.empty((M,), np.int64)
        inst_of[rank_of] = np.arange(M)
        key = (c_node * M + c_rank) * 4 + c_type
        uk = np.unique(key)
        u_type = (uk % 4).astype(np.int64)
        u_ni = uk // 4
        u_inst = (u_ni % M).astype(np.int64)    # rank of the claimant
        u_node = u_ni // M
        u_nt = u_node * 4 + u_type

        # append capacity bookkeeping (claims sorted by parent, then rank)
        ahr = rank_of[ahi]
        ap_order = np.lexsort((ahr, ahn))
        apP, apI = ahn[ap_order], ahr[ap_order]
        ap_n0 = (g_nch[lut(apP)].astype(np.int64) if len(apP)
                 else np.zeros(0, np.int64))
        ap_grp = np.r_[True, apP[1:] != apP[:-1]] if len(apP) else \
            np.zeros(0, bool)
        ap_gid = (np.cumsum(ap_grp) - 1) if len(apP) else \
            np.zeros(0, np.int64)
        n_ap_grp = int(ap_gid[-1]) + 1 if len(apP) else 0

        def group_min12(sel):
            """Per-(node,type): two smallest claimant indices among the
            selected claims."""
            nt, inst = u_nt[sel], u_inst[sel]
            if len(nt) == 0:
                return nt, inst, inst
            o = np.lexsort((inst, nt))
            nt, inst = nt[o], inst[o]
            starts = np.r_[0, np.flatnonzero(nt[1:] != nt[:-1]) + 1]
            lens = np.diff(np.r_[starts, len(nt)])
            m2 = np.where(lens >= 2,
                          inst[np.minimum(starts + 1, len(nt) - 1)], INF)
            return nt[starts], inst[starts], m2

        def lookup(keys, vals, q):
            if len(keys) == 0:
                return np.full(len(q), INF, np.int64)
            pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
            return np.where(keys[pos] == q, vals[pos], INF)

        rstatus = status[inst_of]               # rank-indexed statuses
        for _ in range(64):
            und = rstatus == UND
            if not und.any():
                break
            alive_sel = rstatus[u_inst] != REJ
            acc_sel = rstatus[u_inst] == ACC
            ak, a1, a2 = group_min12(alive_sel)
            ck, c1, _ = group_min12(acc_sel)
            uq = und[u_inst]
            qn, qt, qi = u_node[uq], u_type[uq], u_inst[uq]
            can = np.ones(len(qn), bool)
            rej = np.zeros(len(qn), bool)
            for t_mine in range(4):
                mm = qt == t_mine
                if not mm.any():
                    continue
                for t_o in _CONF_SETS[t_mine]:
                    q = qn[mm] * 4 + t_o
                    m1v = lookup(ak, a1, q)
                    m2v = lookup(ak, a2, q)
                    pred = np.where(m1v == qi[mm], m2v, m1v)
                    can[mm] &= pred >= qi[mm]
                    rej[mm] |= lookup(ck, c1, q) != INF
            inst_rej = np.zeros(M, bool)
            inst_rej[qi[rej]] = True
            inst_can = np.ones(M, bool)
            np.logical_and.at(inst_can, qi, can)
            if len(apP):
                ap_alive = (rstatus[apI] != REJ).astype(np.int64)
                acc_tot = np.zeros(n_ap_grp, np.int64)
                np.add.at(acc_tot, ap_gid, (rstatus[apI] == ACC))
                cum = np.cumsum(ap_alive)
                s_idx = np.maximum.accumulate(
                    np.where(ap_grp, np.arange(len(apP)), 0))
                before_grp = cum[s_idx] - ap_alive[s_idx]
                alive_pred = cum - ap_alive - before_grp
                und_ap = rstatus[apI] == UND
                cap_rej = und_ap & (ap_n0 + acc_tot[ap_gid] + 1 > F)
                cap_wait = und_ap & (ap_n0 + alive_pred + 1 > F)
                inst_rej[apI[cap_rej]] = True
                np.logical_and.at(inst_can, apI[cap_wait], False)
            newly_rej = und & inst_rej
            newly_acc = und & ~inst_rej & inst_can
            rstatus[newly_rej] = REJ
            rstatus[newly_acc] = ACC
            if not (newly_rej.any() or newly_acc.any()):
                break
        status = rstatus[rank_of]               # back to instance space
    status[status == UND] = REJ
    accepted = status == ACC
    _tt = _tr("acceptance", _tt)
    if not accepted.any():
        return accepted[:m], np.zeros((0,), np.int64)

    # ---- virtual-id remap + composition ---------------------------------
    alloc_per_inst = np.where(sv, su, 0).sum(axis=1)
    offsets = np.zeros((M,), np.int64)
    acc_alloc = np.where(accepted, alloc_per_inst, 0)
    offsets[1:] = np.cumsum(acc_alloc)[:-1]
    n_new = int(acc_alloc.sum())
    tree._ensure_capacity(n_new // 2 + 1)

    def remap(arr):
        off = offsets.reshape((M,) + (1,) * (arr.ndim - 1))
        return np.where(arr >= n_alloc0, arr + off, arr).astype(np.int64)

    stat_g = remap(sidx)
    cidx_g = remap(cidx)
    cvals_g = remap(cvals)
    pidx_g = remap(small["par_idx"])
    pval_g = remap(small["par_val"])
    acc2 = accepted[:, None]

    # children-row writes: all recorded rows except the shared-composed
    # slots (append parent at j=0 of new steps, splice parent at j=1 of
    # fringe steps); within-instance later steps win, cross-instance
    # targets are disjoint by construction
    crow_ok = acc2[:, :, None] & sv[:, :, None] & (cidx >= 0)
    crow_ok[:, :, 0] &= ~(append_mask & accepted[:, None])
    crow_ok[:, :, 1] &= ~(splice_mask & accepted[:, None])
    flat_nodes = cidx_g[crow_ok]
    flat_rows = cvals_g[crow_ok]
    flat_n = small["crow_n"][crow_ok]
    sel = _keep_last(flat_nodes)
    cidx_a = flat_nodes[sel]
    cvals_a = flat_rows[sel]
    cn_a = flat_n[sel]

    # composed shared-parent rows (frozen base + splices + appends)
    spl_mask = splice_mask & acc2
    app_mask = append_mask & acc2
    sp_P = cidx[spl_mask][:, 1] if spl_mask.any() else np.zeros(0, np.int64)
    sp_L = cvals[spl_mask][:, 0, 0] if spl_mask.any() else sp_P
    sp_new = stat_g[spl_mask][:, 0] if spl_mask.any() else sp_P
    ap_P = cidx[app_mask][:, 0] if app_mask.any() else np.zeros(0, np.int64)
    ap_leaf = stat_g[app_mask][:, 1] if app_mask.any() else ap_P
    ap_I = ii[app_mask] if app_mask.any() else ap_P
    if len(sp_P) or len(ap_P):
        shared_P = np.unique(np.concatenate([sp_P, ap_P]))
        rows = g_children[lut(shared_P)].astype(np.int64)
        ns = g_nch[lut(shared_P)].astype(np.int64)
        if len(sp_P):
            k = np.searchsorted(shared_P, sp_P)
            jpos = np.argmax(rows[k] == sp_L[:, None], axis=1)
            rows[k, jpos] = sp_new
        if len(ap_P):
            order = np.lexsort((ap_I, ap_P))
            sP = ap_P[order]
            grp = np.r_[True, sP[1:] != sP[:-1]]
            idxr = np.arange(len(sP))
            rank = idxr - np.maximum.accumulate(np.where(grp, idxr, 0))
            k = np.searchsorted(shared_P, sP)
            slot = ns[k] + rank
            rows[k, slot] = ap_leaf[order]
            np.add.at(ns, k, 1)
        cidx_a = np.concatenate([cidx_a, shared_P])
        cvals_a = np.concatenate([cvals_a, rows])
        cn_a = np.concatenate([cn_a, ns])

    # parent-pointer writes (targets disjoint across accepted instances)
    par_ok = acc2[:, :, None] & sv[:, :, None] & (small["par_idx"] >= 0)
    p_nodes = pidx_g[par_ok]
    p_vals = pval_g[par_ok]
    selp = _keep_last(p_nodes)
    pidx_a = p_nodes[selp]
    pval_a = p_vals[selp]

    freed = fn[is_split & acc2].astype(np.int64)
    roots = small["root"][(small["root"] >= 0) & sv & acc2]
    roots_g = remap(small["root"])[(small["root"] >= 0) & sv & acc2]
    new_root = int(roots_g[-1]) if len(roots) else -1

    # ---- exact order-free stat composition ------------------------------
    # increments: cur at every non-fringe scoring step; fresh leaf of
    # new/fringe; fringe's p_new.  Fresh bases: p_new <- frozen leaf stats,
    # merge node <- Chan-merge of its frozen sources, leaves <- zero.
    D = cx.shape[1]
    t0 = (is_merge | is_new | is_absorb | is_best) & acc2
    t1 = (is_new | is_fringe) & acc2
    t2 = is_fringe & acc2
    pn = np.concatenate([stat_g[t0][:, 0], stat_g[t1][:, 1],
                         stat_g[t2][:, 0]])
    pi = np.concatenate([ii[t0], ii[t1], ii[t2]])
    mrg = is_merge & acc2
    mrg_m = stat_g[mrg][:, 1]
    mrg_b1 = cvals[mrg][:, 1, 0]
    mrg_b2 = cvals[mrg][:, 1, 1]
    fr_pnew = stat_g[t2][:, 0]
    fr_L = cvals[t2][:, 0, 0]

    uniq = np.unique(np.concatenate([pn, mrg_m]))
    U = len(uniq)
    base_c = np.zeros((U,), np.float64)
    base_mu = np.zeros((U, D), np.float64)
    base_M = np.zeros((U, D), np.float64)
    old = uniq < n_alloc0
    if old.any():
        k = lut(uniq[old])
        base_c[old] = g_counts[k]
        base_mu[old] = g_means[k]
        base_M[old] = g_m2s[k]
    if len(fr_pnew):
        k = np.searchsorted(uniq, fr_pnew)
        kl = lut(fr_L)
        base_c[k] = g_counts[kl]
        base_mu[k] = g_means[kl]
        base_M[k] = g_m2s[kl]
    if len(mrg_m):
        k = np.searchsorted(uniq, mrg_m)
        k1, k2 = lut(mrg_b1), lut(mrg_b2)
        c1 = g_counts[k1].astype(np.float64)
        c2 = g_counts[k2].astype(np.float64)
        mu1 = g_means[k1].astype(np.float64)
        mu2 = g_means[k2].astype(np.float64)
        tot = c1 + c2
        d = mu2 - mu1
        base_c[k] = tot
        base_mu[k] = (c1[:, None] * mu1 + c2[:, None] * mu2) / tot[:, None]
        base_M[k] = (g_m2s[k1] + g_m2s[k2]
                     + d * d * (c1 * c2 / tot)[:, None])

    inv = np.searchsorted(uniq, pn)
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    xc = cx[pi[order]].astype(np.float64) - base_mu[inv_s]
    starts = np.r_[0, np.flatnonzero(inv_s[1:] != inv_s[:-1]) + 1]
    seg = inv_s[starts]
    n_b = np.zeros((U,), np.float64)
    s_b = np.zeros((U, D), np.float64)
    q_b = np.zeros((U, D), np.float64)
    n_b[seg] = np.diff(np.r_[starts, len(inv_s)])
    s_b[seg] = np.add.reduceat(xc, starts, axis=0)
    q_b[seg] = np.add.reduceat(xc * xc, starts, axis=0)

    c_new = base_c + n_b
    safe = np.maximum(c_new, 1.0)
    dmu = s_b / safe[:, None]
    mu_new = base_mu + dmu
    m2_new = np.maximum(base_M + q_b - safe[:, None] * dmu * dmu, 0.0)

    _tt = _tr("compose", _tt)
    # ---- device apply ----------------------------------------------------
    bs = _bucket(U)
    bc = _bucket(len(cidx_a), lo=16)
    bp = _bucket(len(pidx_a), lo=16)
    bf = _bucket(len(freed), lo=16)
    tree.state = _apply_bulk(
        tree.state,
        jnp.asarray(_pad(uniq.astype(np.int32), bs, np.int32(-1))),
        jnp.asarray(_pad(c_new.astype(np.float32), bs, np.float32(0.0))),
        jnp.asarray(_pad(mu_new.astype(np.float32), bs, np.float32(0.0))),
        jnp.asarray(_pad(m2_new.astype(np.float32), bs, np.float32(0.0))),
        jnp.asarray(_pad(cidx_a.astype(np.int32), bc, np.int32(-1))),
        jnp.asarray(_pad(cvals_a.astype(np.int32), bc, np.int32(-1))),
        jnp.asarray(_pad(cn_a.astype(np.int32), bc, np.int32(0))),
        jnp.asarray(_pad(pidx_a.astype(np.int32), bp, np.int32(-1))),
        jnp.asarray(_pad(pval_a.astype(np.int32), bp, np.int32(-1))),
        jnp.asarray(_pad(freed.astype(np.int32), bf, np.int32(-1))),
        jnp.asarray(len(freed), jnp.int32),
        jnp.asarray(n_new, jnp.int32),
        jnp.asarray(new_root, jnp.int32),
    )
    jax.block_until_ready(tree.state.counts)
    _tt = _tr("apply", _tt)
    tree.n_inserted += int(accepted.sum())
    leaves_g = np.where(leaves >= n_alloc0, leaves + offsets, leaves)
    acc_m = accepted[:m]
    return acc_m, leaves_g[:m][acc_m]


def bulk_insert(tree, xs: np.ndarray, chunk: int = 4096,
                max_steps: int = 16, waves: int = 5,
                min_wave: int = 48) -> np.ndarray:
    """Insert ``xs`` in frozen-epoch chunks with multi-wave conflict
    resolution.  Returns leaf ids per instance.

    ``tree`` is a core.tree.CobwebTree.  Each wave re-descends the
    previous wave's rejected instances against the updated state; the
    residue after ``waves`` rounds (or once a wave shrinks below
    ``min_wave``) is re-inserted through ``tree.fit`` (exact path).
    """
    xs = np.asarray(xs, np.float32)
    leaves_out = np.full((len(xs),), -1, np.int64)

    for s0 in range(0, len(xs), chunk):
        cx = xs[s0:s0 + chunk]
        pending = np.arange(len(cx))
        # small chunks (tests, tails) still get one wave; below the floor
        # the exact path is cheaper than a wave's fixed costs
        lo = max(1, min(min_wave, len(cx)))
        for _ in range(waves):
            if len(pending) < lo:
                break
            acc, acc_leaves = _bulk_wave(tree, cx[pending], max_steps)
            leaves_out[s0 + pending[acc]] = acc_leaves
            pending = pending[~acc]
            if not acc.any():
                break
        if len(pending):
            leaves_out[s0 + pending] = tree.fit(cx[pending])
    return leaves_out
