"""Sharded Cobweb forest over a TPU mesh.

The reference is single-process (SURVEY.md §2c: no torch.distributed / NCCL /
MPI anywhere); scaling there means more SLURM jobs.  This module is the
first-class distributed layer the TPU build adds: a *forest* of independent
Cobweb trees, one shard per mesh device, with

  * insert routing by global sentence id (round-robin -> balanced shards),
  * per-shard batched inserts running under ``shard_map`` (every device
    executes its own ``lax.fori_loop`` insert program concurrently),
  * batched queries: per-shard scoring + local top-k, then an
    ``all_gather`` of the (k, scores) candidates over the mesh axis and a
    global top-k merge — the collective rides ICI, and only k candidates
    per shard cross the interconnect, never the full score matrix.

Cobweb trees are order-sensitive but a forest-of-trees is how the algorithm
scales anyway (each tree sees a subset); recall parity is validated in
tests/test_forest.py against the single-tree build.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.core.tree import CobwebTree, TreeState


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


class StackedIndex(NamedTuple):
    """Per-shard PredictionIndex arrays stacked on a leading shard axis and
    padded to common sizes; ``sentence_valid`` masks the padding rows."""

    inv_var_T: jnp.ndarray       # (K, D, N)
    mu_over_var_T: jnp.ndarray   # (K, D, N)
    const: jnp.ndarray           # (K, N)
    paths: jnp.ndarray           # (K, S, P)
    path_weights: jnp.ndarray    # (K, S, P)
    sentence_valid: jnp.ndarray  # (K, S) bool
    leaf_node: jnp.ndarray       # (K, S) compact node idx of the sentence leaf
    global_sid: jnp.ndarray      # (K, S) shard-local row -> global id, -1 pad
    # beam-search arrays (per-lane compact numbering, same as PredictionIndex)
    children: jnp.ndarray             # (K, N, F) compact child idx, -1 pad
    leaf_sentence_start: jnp.ndarray  # (K, N)
    leaf_sentence_count: jnp.ndarray  # (K, N)
    sentence_order: jnp.ndarray       # (K, S) local sids grouped by leaf

    def lane(self, s: int) -> "index_mod.PredictionIndex":
        """The lane-local PredictionIndex view of shard ``s``."""
        return index_mod.PredictionIndex(
            inv_var_T=self.inv_var_T[s], mu_over_var_T=self.mu_over_var_T[s],
            const=self.const[s], paths=self.paths[s],
            path_weights=self.path_weights[s], children=self.children[s],
            leaf_sentence_start=self.leaf_sentence_start[s],
            leaf_sentence_count=self.leaf_sentence_count[s],
            sentence_order=self.sentence_order[s],
        )


def build_stacked_index(cfg: TreeConfig, host_state: TreeState,
                        leaf_of_local: list, shard_of: list,
                        local_sid: list, n_sentences: int) -> StackedIndex:
    """Per-lane prediction indexes padded to common shapes and stacked on a
    leading lane axis.  Shared by the mesh forest (CobwebForest) and the
    single-device vmapped forest (parallel/vforest.py)."""
    K = host_state.counts.shape[0]
    per_shard = []
    for s in range(K):
        st_s = jax.tree.map(lambda a: np.asarray(a[s]), host_state)
        shard_tree = CobwebTree.__new__(CobwebTree)
        shard_tree.cfg = cfg
        shard_tree.state = st_s
        # as_numpy: per-lane indexes stay host-side — they are immediately
        # padded+stacked below; per-lane device round trips would pay the
        # ~30 ms relay latency (and a remote compile per distinct lane
        # shape) K times over
        idx = index_mod.build_index(
            shard_tree, np.asarray(leaf_of_local[s], np.int32),
            as_numpy=True,
        )
        per_shard.append(idx)

    N = max(i.num_nodes for i in per_shard)
    S = max(max(i.num_sentences for i in per_shard), 1)
    Pd = max(i.paths.shape[1] for i in per_shard)

    def pad(a, shape, fill):
        out = np.full(shape, fill, np.asarray(a).dtype)
        sl = tuple(slice(0, d) for d in np.asarray(a).shape)
        out[sl] = np.asarray(a)
        return out

    inv = np.stack([pad(i.inv_var_T, (cfg.dim, N), 1.0) for i in per_shard])
    mov = np.stack([pad(i.mu_over_var_T, (cfg.dim, N), 0.0)
                    for i in per_shard])
    const = np.stack([pad(i.const, (N,), 0.0) for i in per_shard])
    paths = np.stack([pad(i.paths, (S, Pd), -1) for i in per_shard])
    pw = np.stack([pad(i.path_weights, (S, Pd), 0.0) for i in per_shard])
    valid = np.stack([
        pad(np.ones((i.num_sentences,), bool), (S,), False)
        for i in per_shard
    ])
    # deepest valid path entry = the sentence's leaf (compact idx)
    leaf_node = np.stack([
        pad(np.asarray(i.paths)[
            np.arange(i.num_sentences),
            (np.asarray(i.paths) >= 0).sum(1) - 1,
        ] if i.num_sentences else np.zeros((0,), np.int32), (S,), 0)
        for i in per_shard
    ])
    gsid = np.full((K, S), -1, np.int64)
    if n_sentences:
        gsid[np.asarray(shard_of[:n_sentences]),
             np.asarray(local_sid[:n_sentences])] = np.arange(n_sentences)

    F = max(i.children.shape[1] for i in per_shard)
    kids = np.stack([pad(i.children, (N, F), -1) for i in per_shard])
    lstart = np.stack([pad(i.leaf_sentence_start, (N,), -1)
                       for i in per_shard])
    lcount = np.stack([pad(i.leaf_sentence_count, (N,), 0)
                       for i in per_shard])
    sorder = np.stack([pad(i.sentence_order, (S,), 0) for i in per_shard])

    return StackedIndex(
        inv_var_T=jnp.asarray(inv), mu_over_var_T=jnp.asarray(mov),
        const=jnp.asarray(const), paths=jnp.asarray(paths),
        path_weights=jnp.asarray(pw), sentence_valid=jnp.asarray(valid),
        leaf_node=jnp.asarray(leaf_node), global_sid=jnp.asarray(gsid),
        children=jnp.asarray(kids), leaf_sentence_start=jnp.asarray(lstart),
        leaf_sentence_count=jnp.asarray(lcount),
        sentence_order=jnp.asarray(sorder),
    )


def merge_stacked_to_flat(stacked: StackedIndex) -> "index_mod.PredictionIndex":
    """Flatten a K-lane StackedIndex into ONE PredictionIndex over global
    sentence ids: lane l's compact node ids are offset by ``l * N`` and the
    per-lane GEMM terms / paths concatenate.  The result drives every
    single-tree fast-query engine (gather, blocked MXU, Pallas kernel,
    leaf-lp re-rank) over the whole forest at once.

    NOT valid for ``beam_search_topk`` (there is no single root; compact
    slot 0 is lane 0's root) — forest beam goes through
    parallel/vforest.vforest_beam_topk instead.
    """
    K, D, N = stacked.inv_var_T.shape
    S_pad = stacked.paths.shape[1]
    Pd = stacked.paths.shape[2]

    inv = np.asarray(stacked.inv_var_T)     # (K, D, N)
    mov = np.asarray(stacked.mu_over_var_T)
    const = np.asarray(stacked.const)       # (K, N)
    inv_flat = np.concatenate([inv[l] for l in range(K)], axis=1)   # (D, K*N)
    mov_flat = np.concatenate([mov[l] for l in range(K)], axis=1)
    const_flat = const.reshape(K * N)

    paths = np.asarray(stacked.paths)       # (K, S_pad, P)
    pw = np.asarray(stacked.path_weights)
    gsid = np.asarray(stacked.global_sid)   # (K, S_pad)
    valid = gsid >= 0
    n_sent = int(valid.sum())
    offs = (np.arange(K) * N)[:, None, None]
    paths_off = np.where(paths >= 0, paths + offs, -1)

    flat_paths = np.full((n_sent, Pd), -1, np.int32)
    flat_pw = np.zeros((n_sent, Pd), np.float32)
    lanes, rows = np.nonzero(valid)
    sids = gsid[lanes, rows]
    flat_paths[sids] = paths_off[lanes, rows]
    flat_pw[sids] = pw[lanes, rows]

    # leaf bookkeeping in global numbering
    plen = (flat_paths >= 0).sum(1)
    leaf_of = flat_paths[np.arange(n_sent), np.maximum(plen - 1, 0)]
    sent_order = np.argsort(leaf_of, kind="stable").astype(np.int32)
    sorted_leaves = leaf_of[sent_order]
    leaf_start = np.full((K * N,), -1, np.int32)
    leaf_count = np.zeros((K * N,), np.int32)
    uniq, starts, counts = np.unique(sorted_leaves, return_index=True,
                                     return_counts=True)
    leaf_start[uniq] = starts.astype(np.int32)
    leaf_count[uniq] = counts.astype(np.int32)

    kids = np.asarray(stacked.children)     # (K, N, F)
    kids_flat = np.where(kids >= 0, kids + offs, -1).reshape(K * N, -1)

    return index_mod.PredictionIndex(
        inv_var_T=jnp.asarray(inv_flat),
        mu_over_var_T=jnp.asarray(mov_flat),
        const=jnp.asarray(const_flat),
        paths=jnp.asarray(flat_paths),
        path_weights=jnp.asarray(flat_pw),
        children=jnp.asarray(kids_flat.astype(np.int32)),
        leaf_sentence_start=jnp.asarray(leaf_start),
        leaf_sentence_count=jnp.asarray(leaf_count),
        sentence_order=jnp.asarray(sent_order),
    )


class CobwebForest:
    """A forest of Cobweb trees sharded across a device mesh."""

    def __init__(self, cfg: TreeConfig, mesh: Optional[Mesh] = None,
                 capacity_per_shard: int = 4096, seed: int = 0,
                 axis_name: str = "shard"):
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        self.axis = axis_name
        self.n_shards = self.mesh.devices.size
        self.capacity = capacity_per_shard
        self._key = jax.random.PRNGKey(seed)
        # stacked tree state, sharded on the leading axis
        states = [tree_mod.init_state(capacity_per_shard, cfg.dim,
                                      cfg.max_fanout)
                  for _ in range(self.n_shards)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        self.state: TreeState = jax.device_put(
            stacked, self._sharding(stacked)
        )
        # global sentence bookkeeping (host)
        self.n_sentences = 0
        self.shard_of: list[int] = []
        self.local_sid: list[int] = []
        self._leaf_of_local: list[list[int]] = [
            [] for _ in range(self.n_shards)
        ]
        self._stacked_index: Optional[StackedIndex] = None

    def _sharding(self, tree_like):
        return jax.tree.map(
            lambda x: NamedSharding(
                self.mesh, P(self.axis, *([None] * (x.ndim - 1)))
            ),
            tree_like,
        )

    # ------------------------------------------------------------------ #
    # insertion                                                          #
    # ------------------------------------------------------------------ #
    def add(self, embeddings: np.ndarray, batch_per_shard: int = 1024
            ) -> np.ndarray:
        """Insert a batch, round-robin routed across shards.  Returns global
        sentence ids."""
        embeddings = np.asarray(embeddings, np.float32)
        B = len(embeddings)
        K = self.n_shards
        gids = np.arange(self.n_sentences, self.n_sentences + B)
        shard_of = gids % K

        # per-shard row lists, padded to the common max (bucketed)
        max_rows = int(np.max(np.bincount(shard_of, minlength=K)))
        max_rows = min(batch_per_shard * (-(-max_rows // batch_per_shard)),
                       max(max_rows, 1))
        xs = np.zeros((K, max_rows, self.cfg.dim), np.float32)
        n_valid = np.zeros((K,), np.int32)
        row_of = np.zeros((B,), np.int32)
        for i, (g, s) in enumerate(zip(gids, shard_of)):
            r = n_valid[s]
            xs[s, r] = embeddings[i]
            row_of[i] = r
            n_valid[s] = r + 1

        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, K * max_rows).reshape(K, max_rows, -1)

        state, leaves = _forest_insert(
            self.mesh, self.axis, self.cfg
        )(self.state, jnp.asarray(xs), jnp.asarray(keys),
          jnp.asarray(n_valid))
        self.state = state
        leaves = np.asarray(leaves)  # (K, max_rows)

        for i, (g, s) in enumerate(zip(gids, shard_of)):
            self.shard_of.append(int(s))
            self.local_sid.append(len(self._leaf_of_local[s]))
            self._leaf_of_local[s].append(int(leaves[s, row_of[i]]))
        self.n_sentences += B
        self._stacked_index = None
        return gids

    # ------------------------------------------------------------------ #
    # query                                                              #
    # ------------------------------------------------------------------ #
    def build_index(self) -> StackedIndex:
        """Per-shard prediction indexes, padded to common shapes and stacked
        on the sharded axis (host-side structure derivation, device stats)."""
        if self._stacked_index is not None:
            return self._stacked_index
        stacked = build_stacked_index(
            self.cfg, jax.device_get(self.state), self._leaf_of_local,
            self.shard_of, self.local_sid, self.n_sentences,
        )
        self._stacked_index = jax.device_put(
            stacked, self._sharding(stacked)
        )
        return self._stacked_index

    def query_topk(self, queries: np.ndarray, k: int):
        """(B, D) queries -> (scores (B, k), global ids (B, k)).

        Per-shard score + local top-k under ``shard_map``, candidates
        all-gathered over ICI, merged by a second top-k.
        """
        idx = self.build_index()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        scores, gids = _forest_query(self.mesh, self.axis, k)(idx, q)
        return np.asarray(scores), np.asarray(gids)


@functools.lru_cache(maxsize=None)
def _forest_insert(mesh: Mesh, axis: str, cfg: TreeConfig):
    """shard_map'd insert step: every device runs its own batched insert."""

    def per_shard(state, xs, keys, n_valid):
        # leading shard axis of size 1 inside shard_map -> squeeze
        st = jax.tree.map(lambda a: a[0], state)
        st, leaves = tree_mod.insert_batch(
            st, xs[0], keys[0], n_valid[0], cfg
        )
        return (jax.tree.map(lambda a: a[None], st), leaves[None])

    spec_state = P(axis)
    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec_state, P(axis), P(axis), P(axis)),
        out_specs=(spec_state, P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _forest_query(mesh: Mesh, axis: str, k: int):
    """shard_map'd query: local rank-scores + top-k, all_gather, merge."""

    def per_shard(idx: StackedIndex, q):
        local = jax.tree.map(lambda a: a[0], idx)
        # score this shard's sentences: within-shard ranking uses the Cobweb
        # path score; the cross-shard merge key is the candidate's *leaf*
        # log-probability, which is calibrated identically on every shard
        # (path averages are not comparable between differently shaped trees)
        from rag_cobweb_tpu.ops.gaussian import batched_node_log_probs

        nlp = batched_node_log_probs(
            q, local.inv_var_T, local.mu_over_var_T, local.const
        )                                                    # (B, N)
        scores = index_mod.path_scores_from_nlp(
            local.paths, local.path_weights, nlp
        )                                                    # (B, S)
        scores = jnp.where(local.sentence_valid[None, :], scores, -jnp.inf)
        kk = min(k, scores.shape[1])
        _, rows = jax.lax.top_k(scores, kk)                  # (B, kk)
        gids = local.global_sid[rows]                        # (B, kk)
        leaf_lp = jnp.take_along_axis(
            nlp, local.leaf_node[rows].reshape(q.shape[0], kk), axis=1
        )
        leaf_lp = jnp.where(gids >= 0, leaf_lp, -jnp.inf)
        # gather candidates from every shard over ICI
        all_top = jax.lax.all_gather(leaf_lp, axis)          # (K, B, kk)
        all_gids = jax.lax.all_gather(gids, axis)
        K = all_top.shape[0]
        B = all_top.shape[1]
        merged = jnp.transpose(all_top, (1, 0, 2)).reshape(B, K * kk)
        merged_ids = jnp.transpose(all_gids, (1, 0, 2)).reshape(B, K * kk)
        final, pos = jax.lax.top_k(merged, min(k, K * kk))
        return final, jnp.take_along_axis(merged_ids, pos, axis=1)

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)
