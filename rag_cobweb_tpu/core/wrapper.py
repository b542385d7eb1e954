"""CobwebIndex — the database facade (reference CobwebWrapper parity).

API parity with src/cobweb/CobwebWrapper.py:12-694: sentence store,
incremental ``add_sentences``, slow (tree-search) and fast (indexed)
prediction, differentiable rank scores, level-weight schedules, JSON
persistence, and graphviz subtree visualization — redesigned batch-first:
every query entry point accepts a single input or a batch and executes as
one device computation.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import index as index_mod
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.core.tree import CobwebTree


def _identity_encode(x):
    return np.asarray(x, np.float32)


def _load_whitener(extras):
    if "whitener_pickle" not in extras:
        return None
    import pickle
    return pickle.loads(np.asarray(extras["whitener_pickle"],
                                   np.uint8).tobytes())


class CobwebIndex:
    """Hierarchical vector database over a Cobweb concept tree.

    Parameters mirror CobwebWrapper.__init__ (:13-50): ``corpus`` (list of
    sentences, may be None entries for embedding-only rows),
    ``corpus_embeddings`` (array-like (S, D)), ``encode_func`` (text ->
    embeddings; identity by default — the hermetic-test seam the reference
    establishes, SURVEY.md §4).
    """

    def __init__(self, corpus=None, corpus_embeddings=None,
                 encode_func: Callable = _identity_encode,
                 config: Optional[TreeConfig] = None,
                 capacity: Optional[int] = None, seed: int = 0,
                 n_subtrees: int = 1, routing: str = "round_robin",
                 whitener=None, build_device=None):
        """``n_subtrees > 1`` selects forest mode: K independent subtrees on
        one device with round-robin inserts running K-wide under ``vmap``
        (parallel/vforest.py) — ~K× insert throughput; queries merge
        across lanes by leaf log-probability.  Tree-shape introspection
        (dump_json / print_tree / visualize) stays single-tree only.

        ``routing="content"`` (forest mode) shards lanes by embedding
        content (nearest lane centroid, load-balanced): beam queries then
        descend only each query's few nearest lanes instead of all K —
        see parallel/vforest.VForest.

        ``whitener``: an optional fitted whitening model (e.g.
        ``PCAICAWhiteningModel``).  When attached, the wrapper OWNS the
        transform: embeddings arrive RAW, the tree + candidate pool run in
        whitened space (better clustering, smaller dim), and the vector
        store + exact re-rank + pending closed form run in the RAW space —
        so the final ranking equals exact RAW search whenever the gold is
        in the candidate pool.  On the calibrated-hard benchmark this
        closes the whitening information-loss gap entirely (delta vs raw
        exact 0.000 at c=10k vs the reference's 0.007,
        /root/reference/outputs/qqp/...c10000_t1000_k20_d21a8956.txt)."""
        self.encode_func = encode_func
        self.whitener = whitener
        self.sentences: list = []
        self.leaf_of_sentence: list[int] = []
        self.n_subtrees = int(n_subtrees)

        if corpus_embeddings is not None:
            corpus_embeddings = np.asarray(corpus_embeddings, np.float32)
            dim = corpus_embeddings.shape[1]
            if whitener is not None:   # tree dim = whitened dim
                dim = np.asarray(
                    whitener.transform(corpus_embeddings[:1])).shape[-1]
        elif corpus:
            sample = np.asarray(self.encode_func([corpus[0]]))
            if whitener is not None:
                sample = np.asarray(
                    whitener.transform(np.atleast_2d(sample)))
            dim = sample.shape[-1]
        elif config is not None:
            dim = config.dim
        else:
            raise ValueError(
                "need corpus, corpus_embeddings, or config to fix the dim"
            )

        self.cfg = config or TreeConfig(dim=dim)
        n0 = len(corpus_embeddings) if corpus_embeddings is not None else (
            len(corpus) if corpus else 0
        )
        cap = capacity or max(1024, 4 * n0 + 16)
        if self.n_subtrees > 1:
            from rag_cobweb_tpu.parallel.vforest import VForest
            self.tree = None
            # build_device="cpu": pin the forest build to the host CPU
            # backend (the cold-start path — the chip's remote compile of
            # the insert program costs minutes cold, the CPU compile
            # seconds).  Call promote_build_device() after the build to
            # move the state onto the chip for serving.  Requires the cpu
            # platform to be enabled next to the chip backend (e.g.
            # jax.config.update("jax_platforms", "axon,cpu") before first
            # jax use).
            dev = None
            if build_device == "cpu":
                dev = jax.devices("cpu")[0]
            elif build_device not in (None, "default"):
                dev = build_device
            self.forest = VForest(
                self.cfg, n_subtrees=self.n_subtrees,
                capacity_per_tree=max(1024, cap // self.n_subtrees),
                seed=seed, routing=routing, device=dev,
            )
            # the forest may have applied routing-driven config defaults
            # (content routing enables absorb_depth chain compaction)
            self.cfg = self.forest.cfg
        else:
            self.forest = None
            self.tree = CobwebTree(self.cfg, capacity=cap, seed=seed)

        self._index: Optional[index_mod.PredictionIndex] = None
        self._blocked: Optional[index_mod.BlockedIndex] = None
        self._init_vec_store()
        self._init_pending()
        # gather-free MXU path scoring kicks in above this corpus size
        # (its per-block replication build costs a few seconds, repaid at
        # scale — 10x faster at 100k sentences)
        self.blocked_threshold = 8192
        self._level_weights: Optional[list[float]] = None
        self._weight_schedule = None
        self._schedule_params: dict = {}
        self.max_depth = 0

        if corpus_embeddings is not None:
            if corpus is None:
                corpus = [None] * len(corpus_embeddings)
            self.add_sentences(corpus, corpus_embeddings)
        elif corpus:
            self.add_sentences(corpus)

    # ------------------------------------------------------------------ #
    # ingestion                                                          #
    # ------------------------------------------------------------------ #
    def add_sentences(self, new_sentences, new_vectors=None,
                      batch_size: int = 2048, fast_build: bool = False):
        """Incrementally insert sentences/embeddings (reference :52-80).

        The per-item Python loop of the reference becomes a batched
        on-device insert; leaf assignment comes back as one array.
        ``fast_build`` is deprecated: the frozen-epoch bulk path it used
        to select only ever tied the exact path (~1.34k vs ~1.40k
        inserts/s) and was removed — construct with ``n_subtrees=K`` for
        the fast (vmapped forest) build instead.
        """
        if new_vectors is None:
            new_vectors = self.encode_func(new_sentences)
        new_vectors = np.asarray(new_vectors, np.float32)
        if new_vectors.ndim == 1:
            new_vectors = new_vectors[None, :]
        store_vecs = new_vectors
        if self.whitener is not None:
            # tree + pool in whitened space; the vec store (exact re-rank,
            # pending closed form) keeps the RAW rows
            new_vectors = self._whiten_for_build(store_vecs)
        if new_vectors.shape[1] != self.cfg.dim:
            raise ValueError(
                f"vector dim {new_vectors.shape[1]} != tree dim {self.cfg.dim}"
            )
        if len(new_sentences) != len(new_vectors):
            raise ValueError(
                f"{len(new_sentences)} sentences != "
                f"{len(new_vectors)} vectors"
            )
        if self.forest is not None:
            leaves = self.forest.add(new_vectors)  # global sentence ids
        else:
            if fast_build:
                import warnings
                warnings.warn(
                    "fast_build is deprecated (the bulk path was removed; "
                    "it never beat the exact path) — use "
                    "CobwebIndex(n_subtrees=K) for fast forest builds",
                    DeprecationWarning, stacklevel=2)
            leaves = self.tree.fit(new_vectors, batch_size=batch_size)
        n0 = len(self.sentences)
        self.sentences.extend(new_sentences)
        if self.store_embeddings:
            self._vec_chunks.append(store_vecs)
            self._emb_dev_cache = None
            if self.whitener is not None:
                import ml_dtypes
                self._wvec_chunks.append(
                    np.asarray(new_vectors, ml_dtypes.bfloat16))
                self._wemb_dev_cache = None
        if self.forest is None:
            self.leaf_of_sentence.extend(int(l) for l in leaves)
        # bounded-staleness serving (the reference rebuilds its whole
        # prediction index on every mutation, CobwebWrapper.py:80): when a
        # fast-query index already exists, keep serving it and score the
        # new rows exactly via their fresh-leaf closed form
        # (index.pending_leaf_lp) — add-then-query costs ~ms instead of an
        # O(N) rebuild; a full rebuild happens once pending exceeds
        # ``stale_pending_limit`` or an exact-index consumer runs.
        n_new = len(self.sentences) - n0
        if self.forest is not None:
            # the stats-free fused index alone can stale-serve when the
            # exact re-rank store exists (its _rerank_step never touches
            # the flat index) — without this, fused-only serving would
            # fall back to invalidate-per-add, the reference's
            # rebuild-per-mutation anti-pattern (CobwebWrapper.py:82-91)
            has_stale = (self._flat_cache is not None
                         or (getattr(self, "_fused", None) is not None
                             and self.store_embeddings
                             and bool(self._vec_chunks)))
        else:
            has_stale = self._index is not None
        if self.whitener is not None and not (self.store_embeddings
                                              and self._vec_chunks):
            # whitener mode without a vec store: pending closed-form keys
            # (STORE space) would not be comparable to the tree-space
            # leaf-lp fallback — rebuild instead of stale-serving
            has_stale = False
        n_indexed = n0 - self._unindexed_count()
        rebuild_at = max(self.delta_rebuild_min,
                         int(self.delta_rebuild_frac * max(n_indexed, 1)))
        if (self.stale_reads and has_stale
                and self._unindexed_count() + n_new <= rebuild_at):
            self._pending_sids.extend(range(n0, n0 + n_new))
            # pending rows score by the STORE-space closed form (the same
            # key the exact re-rank produces) so stale merges stay exact
            self._pending_vecs = (
                store_vecs if self._pending_vecs is None
                else np.concatenate([self._pending_vecs, store_vecs]))
            if len(self._pending_sids) > self.stale_pending_limit:
                # tier-0 overflow -> consolidate into the device delta
                # segment (O(new rows) append) instead of the old full
                # index invalidation: the stale_pending_limit CLIFF is gone
                self._consolidate_pending()
        else:
            self._invalidate_index()
        return leaves

    # ------------------------------------------------------------------ #
    # prediction index                                                   #
    # ------------------------------------------------------------------ #
    def _init_vec_store(self):
        # stored corpus embeddings (the DB's own vectors, like any vector
        # store): enables the EXACT final re-rank — candidates ranked by
        # true L2 to the stored row, which equals exact whitened search
        # whenever the gold is in the pool.  ~S*D*4 bytes of HBM
        # (512 MB at 1M x 128); set store_embeddings=False to opt out and
        # fall back to the leaf-log-prob re-rank.
        self.store_embeddings = True
        self._vec_chunks: list = []
        self._emb_dev_cache = None
        self._emb_dev_n = 0
        # device dtype of the exact re-rank store ("float32" default;
        # "bfloat16" halves it for 8M-scale serving — distances still
        # computed f32, only the stored row is rounded)
        self.emb_store_dtype = "float32"
        # whitener mode: a SECOND, bf16 store of the whitened (tree-space)
        # rows backs the proximity backstop pool (see _product_chunked);
        # ~S*Dw*2 bytes (256 MB at 1M x 128)
        self._wvec_chunks: list = []
        self._wemb_dev_cache = None
        self._wemb_dev_n = 0

    def _emb_device(self):
        """(cap, D) stored embeddings on device, or None when unavailable
        (store disabled, or a checkpoint loaded without vectors).  Rows at
        or past the live sentence count are ZERO PADDING: the capacity is
        bucketed (1.25x geometric growth, tile-aligned via
        tree.align_capacity) because the jitted exact re-rank compiles per
        emb shape — an exact-sized store would recompile through the
        remote compile service on every add batch.  Padding rows are never
        gathered (candidate ids are always < the live count); the host
        ``_vec_chunks`` store stays exact-sized for checkpoints."""
        if not self.store_embeddings or not self._vec_chunks:
            return None
        n = len(self.sentences)
        if self._emb_dev_cache is None or self._emb_dev_n != n:
            if len(self._vec_chunks) > 1:
                self._vec_chunks = [np.concatenate(self._vec_chunks)]
            host = self._vec_chunks[0]
            if host.shape[0] != n:
                return None
            cap = getattr(self, "_emb_dev_cap", 0)
            if cap < n:
                cap = tree_mod.align_capacity(max(n, int(cap * 1.25), 4096))
                self._emb_dev_cap = cap
            if cap > n:
                host = np.concatenate(
                    [host, np.zeros((cap - n, host.shape[1]), host.dtype)])
            if self.emb_store_dtype != "float32":
                # compressed re-rank store (serve-time option at 8M+: the
                # f32 whitened store alone is 4.1 GB; bf16 halves it).
                # The exact re-rank gathers rows and computes distances in
                # f32 (promotion) — only the stored ROW is rounded, a
                # ~2^-9 relative shift on the distance; the gather stage
                # is row-RATE-limited so bytes don't change its speed.
                import ml_dtypes
                host = np.asarray(host, getattr(ml_dtypes,
                                                self.emb_store_dtype))
            self._emb_dev_cache = jnp.asarray(host)
            self._emb_dev_n = n
        return self._emb_dev_cache

    def compress_stats(self, dtype=None):
        """Forest-state stats compression (see VForest.compress_stats) +
        serving-cache invalidation, so downstream index builds read the
        compressed stats."""
        if self.forest is None:
            st = self.tree.state
            target = jnp.bfloat16 if dtype is None else jnp.dtype(dtype)
            if st.means.dtype != target:
                self.tree.state = st._replace(
                    means=st.means.astype(target),
                    m2s=st.m2s.astype(target))
        else:
            self.forest.compress_stats(dtype)
        self._invalidate_index()

    def offload_state(self):
        """Serve-only mode: move the forest state to host (see
        VForest.offload_state) once the serving index exists — at 8M the
        f32 state is ~13 GB of the 16 GB chip."""
        if self.forest is not None:
            self.forest.offload_state()

    def _wemb_device(self):
        """(cap, Dw) whitened store + (cap,) f32 half-norms on device, or
        None — the backstop pool's GEMM operands.  Whitener mode keeps a
        dedicated bf16 copy of the whitened rows; WITHOUT a whitener the
        tree space IS the store space, so the backstop keys directly on
        the f32 re-rank store (no second copy).  Same bucketed-capacity
        contract as ``_emb_device`` (the backstop GEMM compiles per
        shape).  On checkpoints saved without whitened chunks the store
        is rebuilt from the raw rows through the whitener (one-off host
        transform)."""
        if not self.store_embeddings or not self._vec_chunks:
            return None
        n = len(self.sentences)
        if self.whitener is None:
            emb = self._emb_device()
            if emb is None:
                return None
            if self._wemb_dev_cache is None or self._wemb_dev_n != n:
                self._wemb_dev_cache = (
                    emb,
                    0.5 * jnp.sum(jnp.square(emb.astype(jnp.float32)),
                                  axis=1))
                self._wemb_dev_n = n
            return self._wemb_dev_cache
        if self._wemb_dev_cache is None or self._wemb_dev_n != n:
            import ml_dtypes
            if not self._wvec_chunks:   # checkpoint load: rebuild
                if len(self._vec_chunks) > 1:
                    self._vec_chunks = [np.concatenate(self._vec_chunks)]
                raw = self._vec_chunks[0]
                if raw.shape[0] != n:
                    return None
                self._wvec_chunks = [np.asarray(
                    self.whitener.transform(raw), ml_dtypes.bfloat16)]
            if len(self._wvec_chunks) > 1:
                self._wvec_chunks = [np.concatenate(self._wvec_chunks)]
            host = self._wvec_chunks[0]
            if host.shape[0] != n:
                return None
            cap = getattr(self, "_wemb_dev_cap", 0)
            if cap < n:
                cap = tree_mod.align_capacity(max(n, int(cap * 1.25), 4096))
                self._wemb_dev_cap = cap
            if cap > n:
                host = np.concatenate(
                    [host, np.zeros((cap - n, host.shape[1]), host.dtype)])
            w = jnp.asarray(host)
            self._wemb_dev_cache = (
                w, 0.5 * jnp.sum(jnp.square(w.astype(jnp.float32)), axis=1))
            self._wemb_dev_n = n
        return self._wemb_dev_cache

    def _init_pending(self):
        # tier 0: recent unindexed rows, merged by the (B, Np, D)
        # broadcast closed form — cheap while Np <= stale_pending_limit
        self._pending_sids: list[int] = []
        self._pending_vecs: Optional[np.ndarray] = None
        # tier 1: CONSOLIDATED delta segment — a device-resident (cap, D)
        # buffer of unindexed rows scored by the same closed form in GEMM
        # form (index.delta_exact_topk).  Tier-0 overflow appends here
        # instead of invalidating the index, so append-mostly workloads
        # never hit the full flatten+blocked rebuild cliff; the rebuild is
        # deferred until the segment reaches
        # max(delta_rebuild_min, delta_rebuild_frac * indexed rows).
        self._delta_vecs = None          # device (cap, D) f32
        self._delta_sids = np.empty(0, np.int64)
        self._delta_n = 0
        self._flat_cache = None   # forest mode: last-built flat index,
        #                           retained across adds for stale serving
        self.stale_reads = True
        self.stale_pending_limit = 4096
        self.delta_rebuild_min = 65536
        self.delta_rebuild_frac = 0.10

    def _unindexed_count(self) -> int:
        return len(self._pending_sids) + self._delta_n

    def _invalidate_index(self):
        self._index = None
        self._blocked = None
        self._blocked_f32 = None
        self._fused = None
        self._fused_f32 = None
        self._flat_cache = None
        self._beam_cache = None
        self._beam_src = None
        self._pending_sids = []
        self._pending_vecs = None
        self._delta_vecs = None
        self._delta_sids = np.empty(0, np.int64)
        self._delta_n = 0

    def _consolidate_pending(self):
        """Move tier-0 pending rows into the device delta segment (one
        bucketed-slab append; capacity grows by powers of two)."""
        n_new = len(self._pending_sids)
        if not n_new:
            return
        rows = np.asarray(self._pending_vecs[:n_new], np.float32)
        need = self._delta_n + n_new
        mb = max(1024, 1 << (n_new - 1).bit_length())   # slab bucket
        cap = 0 if self._delta_vecs is None else self._delta_vecs.shape[0]
        if self._delta_n + mb > cap:
            new_cap = max(8192, 1 << (self._delta_n + mb - 1).bit_length())
            buf = jnp.zeros((new_cap, self.cfg.dim), jnp.float32)
            if self._delta_vecs is not None:
                buf = index_mod._append_rows(
                    buf, self._delta_vecs, jnp.int32(0))
            self._delta_vecs = buf
        slab = np.zeros((mb, self.cfg.dim), np.float32)
        slab[:n_new] = rows
        self._delta_vecs = index_mod._append_rows(
            self._delta_vecs, jnp.asarray(slab), jnp.int32(self._delta_n))
        self._delta_sids = np.concatenate(
            [self._delta_sids, np.asarray(self._pending_sids, np.int64)])
        self._delta_n = need
        self._pending_sids = []
        self._pending_vecs = None

    def promote_build_device(self):
        """Move a CPU-pinned forest build onto the default backend (the
        chip) for serving; no-op for unpinned/single-tree indexes."""
        if self.forest is not None and self.forest._device is not None:
            self.forest.to_device()

    def _beam_index(self) -> index_mod.BeamIndex:
        """Packed BeamIndex over the current flat index (cached)."""
        if self.forest is not None:
            return self.forest.beam_index()
        idx = self._flat_pred_index()
        if getattr(self, "_beam_cache", None) is None \
                or self._beam_src is not idx:
            self._beam_cache = index_mod.build_beam_index(idx)
            self._beam_src = idx
        return self._beam_cache

    def _flush_pending(self):
        """Force exact-index semantics (rank_scores, beam, diagnostics)."""
        if self._unindexed_count():
            self._invalidate_index()

    def build_prediction_index(self) -> index_mod.PredictionIndex:
        if self.forest is not None:
            return self.forest.build_index()
        if self._index is None:
            lw = self._level_weights or list(index_mod.DEFAULT_LEVEL_WEIGHTS)
            self._index = index_mod.build_index(
                self.tree, np.asarray(self.leaf_of_sentence, np.int32),
                level_weights=lw,
            )
            depths = np.asarray((self._index.paths >= 0).sum(1))
            self.max_depth = int(depths.max()) if len(depths) else 0
        return self._index

    def force_rebuild_index(self):
        self._invalidate_index()
        self.build_prediction_index()

    def get_prediction_index_info(self) -> dict:
        """Diagnostics (reference :315-333, with its `_node_to_index` bug fixed)."""
        valid = self._index is not None
        info = {
            "index_valid": valid,
            "total_nodes": self._index.num_nodes if valid else 0,
            "leaf_paths_cached": self._index.num_sentences if valid else 0,
            "means_cached": valid,
            "vars_cached": valid,
        }
        if valid:
            info["means_shape"] = (
                self._index.num_nodes, self.cfg.dim
            )
            info["vars_shape"] = info["means_shape"]
        return info

    def get_node_path_stats(self, sentence_id: int):
        """Mean/var arrays for every node on a sentence's root->leaf path
        (reference :297-313)."""
        self._require_single_tree("get_node_path_stats")
        self._flush_pending()
        idx = self.build_prediction_index()
        if not (0 <= sentence_id < len(self.sentences)):
            return None, None
        path = np.asarray(idx.paths[sentence_id])
        path = path[path >= 0]
        # recover means/vars from the GEMM terms: var = 1/inv_var, mu = movt*var
        inv_var = np.asarray(idx.inv_var_T).T[path]
        var = 1.0 / inv_var
        mean = np.asarray(idx.mu_over_var_T).T[path] * var
        return mean, var

    # ------------------------------------------------------------------ #
    # queries                                                            #
    # ------------------------------------------------------------------ #
    def _as_query_batch(self, input, is_embedding, with_store=False):
        """Normalize a query input to a (B, D) TREE-space device batch.
        With a ``whitener`` attached, inputs arrive RAW and are whitened
        here; ``with_store=True`` additionally returns the RAW (store-
        space) batch for the exact re-rank / pending closed form."""
        if is_embedding:
            arr = np.asarray(input, np.float32)
            single = arr.ndim == 1
        else:
            single = isinstance(input, str)
            texts = [input] if single else list(input)
            arr = np.asarray(self.encode_func(texts), np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        # ONE host->device upload per batch: the raw batch lands on device
        # first and whitening runs from the device copy.  Uploading the
        # raw batch twice (whiten input + q_store) measured ~104 ms extra
        # per 1k x 768 batch through the relay (scripts/transfer_probe.py)
        # — the transfer, not the whitening matmul (~0 ms), is the cost.
        dev = jnp.asarray(arr)
        qt = self._whiten_device(dev) if self.whitener is not None else dev
        if with_store:
            return qt, dev, single
        return qt, single

    def _whiten_for_build(self, raw: np.ndarray) -> np.ndarray:
        """RAW -> tree-space rows for the INSERT path, computed on the
        build device.  The raw-store build used to whiten every chunk in
        host numpy on the single host core — ~40% of raw-mode build
        throughput at 2M (VERDICT r4 #4); ``transform_jit`` is the same
        one-matmul program the serving path already uses, so build and
        serve now share the exact same transform.  Runs under the
        forest's build-device context so cold-cache CPU builds don't
        queue a chip compile behind the minutes-long insert-program
        compile (the remote compile service serializes)."""
        t = getattr(self.whitener, "transform_jit", None)
        if t is None:   # duck-typed whitener without a device transform
            return np.asarray(self.whitener.transform(raw), np.float32)
        import contextlib
        ctx = (self.forest._dev_ctx() if self.forest is not None
               else contextlib.nullcontext())
        with ctx:
            out = t(jnp.asarray(raw))
        return np.asarray(out, np.float32)

    def _whiten_device(self, arr):
        """RAW -> tree-space query batch ON DEVICE: the fused one-matmul
        ``transform_jit`` keeps per-batch whitening off the single host
        core (host numpy costs ~0.1 ms/query at D=768).  Duck-typed
        whiteners without ``transform_jit`` fall back to the host path
        (which round-trips through host memory)."""
        t = getattr(self.whitener, "transform_jit", None)
        if t is not None:
            return t(arr if isinstance(arr, jnp.ndarray)
                     else jnp.asarray(np.asarray(arr, np.float32)))
        return jnp.asarray(np.asarray(
            self.whitener.transform(np.asarray(arr)), np.float32))

    def _flat_pred_index(self) -> index_mod.PredictionIndex:
        """A flat PredictionIndex over GLOBAL sentence ids — the structure
        every large-scale engine (blocked / Pallas / re-rank) consumes.  In
        forest mode this is the whole forest flattened via the multi-root
        BFS (VForest.flat_index); single-tree mode it is the ordinary
        prediction index.  With a pending buffer active, the retained
        STALE flat index serves (pending rows merge by closed form)."""
        if self.forest is not None:
            if self._unindexed_count():
                if self._flat_cache is not None:
                    return self._flat_cache
                # no retained snapshot to serve (fused-only staleness):
                # a rebuild covers the pending rows, so their bookkeeping
                # must clear — otherwise _merge_pending double-counts them
                self._flush_pending()
            self._flat_cache = self.forest.flat_index()
            return self._flat_cache
        return self.build_prediction_index()

    # dtype of the SERVING blocked index.  bf16 halves both the index
    # memory and the sweep's HBM/MXU cost (DEFAULT-precision one-pass MXU
    # vs the 6-pass f32 HIGHEST contraction) and, with the approx pool +
    # EXACT stored-embedding re-rank on top, final rankings are identical:
    # measured at 100k hard, B=4096 — f32 27.3 us/q vs bf16 21.0 at the
    # same recall.  The explicit rerank=0 path (raw path-score ORDER is
    # the contract; bf16 jitter flips near-ties) gets a separately cached
    # f32 index on demand.
    blocked_dtype = "bfloat16"

    def _blocked_index(self, exact: bool = False) -> index_mod.BlockedIndex:
        import jax.numpy as jnp
        if exact and self.blocked_dtype != "float32":
            if getattr(self, "_blocked_f32", None) is None:
                self._blocked_f32 = index_mod.build_blocked_index(
                    self._flat_pred_index())
            return self._blocked_f32
        if self._blocked is None:
            self._blocked = index_mod.build_blocked_index(
                self._flat_pred_index(), dtype=jnp.dtype(self.blocked_dtype)
            )
        return self._blocked

    # the FUSED flat index (core/index.FusedIndex): the W contraction
    # pre-associated into per-sentence coefficients, so the corpus sweep
    # is ONE [q, q^2] @ (2D, S) GEMM — ~4.5x fewer FLOPs and HBM bytes
    # than the blocked sweep at the same (exact-arithmetic-identical)
    # scores, and a build that is one device pass over path hops.
    use_fused = True
    fused_dtype = "bfloat16"
    # dtype of the materialized (B, S) score matrix in the candidate-POOL
    # path (rerank > 0 only — the rerank=0 exact-order contract always
    # scores f32).  Measured at B=1024 x 1M on v5e: the approx_max_k
    # partial-reduce DOMINATES the sweep (~30 of ~40 ms) and its bf16
    # lowering is SLOWER than f32 (186 vs 31 ms unaggregated), so halving
    # the score bytes buys nothing — keep f32 (bf16 remains selectable;
    # pool overlap vs f32-exact measured 0.979, top-64 containment 0.999).
    fused_score_dtype = "float32"

    def _fused_index(self, exact: bool = False) -> index_mod.FusedIndex:
        import jax.numpy as jnp
        attr = ("_fused_f32" if exact and self.fused_dtype != "float32"
                else "_fused")
        dtype = (jnp.float32 if attr == "_fused_f32"
                 else jnp.dtype(self.fused_dtype))
        if getattr(self, attr, None) is None:
            if self.forest is not None and self._flat_cache is None:
                # STATS-FREE build straight from the forest state
                # (index.build_fused_from_state): no flatten, no (D, N)
                # node-stats arrays — at 4M sentences those alone are
                # ~8 GB next to the resident state.  Only valid on a
                # fresh snapshot: with pending rows the serving index
                # must pin the OLD snapshot, which only the retained
                # flat cache represents (and pending only ever accrues
                # while a serving index exists, so this flush is the
                # no-serving-index-yet edge, not a rebuild cliff).
                if self._unindexed_count():
                    self._flush_pending()
                setattr(self, attr,
                        self.forest.fused_index(dtype=dtype))
            else:
                setattr(self, attr, index_mod.build_fused_index(
                    self._flat_pred_index(), dtype=dtype))
        return getattr(self, attr)

    # path-score ranking loses recall against the leaf-lp key wherever the
    # corpus is hard: on the calibrated-hard synthetic at 10k, rerank=0
    # scores 0.846 recall@10 while rerank=128 reaches 0.879 — EXACTLY the
    # whitened-exact ceiling, i.e. the re-ranked engine is lossless w.r.t.
    # its input space (pool sizes 128/512/2048 all saturate).  At 100k on
    # the easy set: rerank=128 -> 0.985, rerank=512 -> 1.000.  The leaf-lp
    # pass is cheap, so auto-rerank switches on whenever the blocked/Pallas
    # engines serve (>= blocked_threshold); 512 covers both regimes.
    rerank_threshold = 8192
    rerank_candidates = 512
    # select the XLA blocked sweep's re-rank CANDIDATE POOL with the
    # TPU-native approximate top-k (jax.lax.approx_max_k) instead of the
    # exact sort: pool membership, not order, is what the exact re-rank
    # consumes, and the exact top-512 epilogue over (B, NB*TS) is the
    # sweep's dominant non-matmul cost at 100k+.  Final rankings stay
    # exact (the re-rank key is exact); rerank=0 serving is unaffected.
    # Controlled A/B at 100k hard, one build, pool 512 (RESULTS.md):
    # exact 0.918 @ 115 us/q, approx(0.95) 0.917 @ 43 us/q, approx(0.99)
    # 0.918 @ 111 us/q — 0.95 is the trade (2.7x for -0.001 recall@10);
    # 0.99 degenerates to exact-sort cost at this input size.
    approx_pool = True
    approx_recall_target = 0.95
    # the fused sweep materializes a (B, Sp) score matrix in
    # fused_score_dtype; above this byte budget the query batch is
    # chunked (each chunk re-streams GT — minor next to the score
    # traffic) so large serving batches cannot OOM the chip
    # (B=2048 x 1M f32 = 8.2 GB of scores did, RESULTS.md)
    fused_score_budget = 2 << 30
    # byte budget for the exact re-rank's (B, C, D) candidate gather —
    # at B=4096 x pool 1024 x D=768 the unchunked gather alone is 12.9 GB
    rerank_gather_budget = 2 << 30
    # proximity BACKSTOP pool (VERDICT r3 #4): union the fused path-score
    # pool with a whitened-L2 approx pool from one bf16 GEMM over the
    # whitened store (index.backstop_topk) before the exact re-rank.  At
    # 1M+ the path-score pool's residual misses are tree-placement
    # outliers the proximity pool catches; below backstop_threshold the
    # path-score pool already saturates (delta ~0.000 at 10k), so "auto"
    # enables it only at scale and only in whitener (raw-store) mode,
    # where the whitened store exists.  int = explicit pool size, 0 = off.
    backstop_pool = "auto"
    backstop_threshold = 131072
    # opt-in: serve the fused Pallas sweep (ops/pallas_query) above
    # pallas_threshold sentences instead of the XLA blocked path.  The
    # kernel's VMEM streaming beat the EXACT-epilogue XLA path at 1M
    # (0.41 vs 0.99 ms/q), but the approximate pool removed that epilogue
    # and the XLA path now wins at every measured scale (us/q, measured
    # head-to-head): 100k 29 vs 52; 500k 145 vs 167; 1M 162 vs 267
    # (scripts/million_benchmark.py, B=256-1024).  The kernel stays as a
    # selectable engine and the fallback proof for VMEM-era corpora.
    use_pallas = False
    pallas_threshold = 300_000
    # per-block candidates the Pallas kernel extracts; the merged pool
    # (NB * block_k) feeds the leaf-lp re-rank
    pallas_block_k = 16

    def _engine_topk(self, q, kk: int, rerank: int, tie_noise: bool,
                     q_store=None):
        """Single dispatch point for the indexed engines: Pallas fused
        sweep -> XLA blocked -> gather path, each with the optional leaf-lp
        re-rank.  Works in both single-tree and forest mode (forest queries
        go through the flattened index).  Returns (scores, ids) DEVICE
        arrays.

        This is the engine ``predict_fast`` itself serves (the reference's
        fast path is its default, CobwebWrapper.py:428 — ours must not hide
        the fastest engine behind a script).

        The fused + exact-re-rank route (the default at scale) never
        touches the flat PredictionIndex — with the stats-free fused
        build (forest mode) the serving working set is the fused
        coefficients + stored embeddings only; the flat index is built
        lazily just for the engines that structurally need it."""
        n_indexed = self._indexed_count()
        if len(self.sentences) >= self.blocked_threshold and not tie_noise:
            if self.use_pallas and len(self.sentences) >= self.pallas_threshold:
                out = self._pallas_topk(self._blocked_index(),
                                        self._flat_pred_index(), q, kk,
                                        rerank, q_store=q_store)
                if out is not None:
                    return out
            if self.use_fused:
                if rerank:
                    pool = min(max(rerank, kk), n_indexed)
                    if self.store_embeddings and \
                            self._emb_device() is not None:
                        # ONE device program: sweep + backstop + exact
                        # re-rank (index.fused_query_rerank) — a single
                        # dispatch per chunk instead of three (each sync
                        # round trip through the relay costs ~25-30 ms)
                        return self._product_chunked(q, kk, pool,
                                                     n_indexed,
                                                     q_store=q_store)
                    cs, cand = self._fused_chunked(
                        self._fused_index(), q, pool,
                        approx=self.approx_pool,
                        score_dtype=self.fused_score_dtype)
                    return self._rerank_step(None, q, cand, cs, kk,
                                             q_store=q_store)
                # rerank=0 contract: exact raw path-score ORDER -> f32 index
                return self._fused_chunked(
                    self._fused_index(exact=True), q, kk, approx=False,
                    score_dtype="float32")
            if rerank:
                cs, cand = index_mod.blocked_query_topk(
                    self._blocked_index(), q,
                    min(max(rerank, kk), n_indexed),
                    approx=self.approx_pool,
                    recall_target=self.approx_recall_target)
                return self._rerank_step(None, q, cand, cs, kk,
                                         q_store=q_store)
            # rerank=0 contract: exact raw path-score ORDER -> f32 index
            return index_mod.blocked_query_topk(
                self._blocked_index(exact=True), q, kk)
        idx = self._flat_pred_index()
        if rerank and not tie_noise:
            c = min(max(rerank, kk), idx.num_sentences)
            cs, cand = index_mod.query_topk(idx, q, c)
            return self._rerank_step(idx, q, cand, cs, kk, q_store=q_store)
        key = (jax.random.PRNGKey(len(self.sentences))
               if tie_noise else None)
        return index_mod.query_topk(idx, q, kk, key)

    def _indexed_count(self) -> int:
        """Sentences covered by the current serving index (pending/delta
        rows are merged separately by their closed form)."""
        return len(self.sentences) - self._unindexed_count()

    def _rerank_step(self, idx, q, cand, cand_scores, kk: int,
                     q_store=None):
        """Final candidate re-rank: EXACT (stored-embedding L2, the
        ``pending_leaf_lp`` closed form) when the vector store is
        available, else leaf log-prob.  Exact makes the engine lossless
        w.r.t. exact search in the STORE space whenever the gold is in the
        pool — leaf-lp cannot order same-leaf near-duplicates (identical
        lp).  ``q_store``: the store-space query batch (RAW when a
        whitener is attached; defaults to ``q``).  ``idx=None``: build the
        flat index lazily only if the leaf-lp fallback actually runs (the
        exact branch never needs it)."""
        emb = self._emb_device()
        if emb is not None:
            qs = q if q_store is None else q_store
            cand = cand.astype(jnp.int32)
            pv = jnp.float32(self.cfg.prior_var)
            B, C = cand.shape
            row = C * emb.shape[1] * 4
            bmax = max(32, int(self.rerank_gather_budget) // max(row, 1))
            if bmax >= B:
                return index_mod.exact_rerank(emb, qs, cand, cand_scores,
                                              kk, pv)
            # chunk the query batch so the (Bc, C, D) candidate gather
            # stays under rerank_gather_budget bytes; power-of-two chunks
            # + padded tail reuse one compiled program (cf. _fused_chunked)
            bmax = 1 << (bmax.bit_length() - 1)
            outs = []
            for s in range(0, B, bmax):
                qc = qs[s:s + bmax]
                cc = cand[s:s + bmax]
                sc = cand_scores[s:s + bmax]
                n = qc.shape[0]
                if n < bmax:
                    qc = jnp.concatenate(
                        [qc, jnp.zeros((bmax - n, qs.shape[1]), qs.dtype)])
                    cc = jnp.concatenate(
                        [cc, jnp.zeros((bmax - n, C), cc.dtype)])
                    sc = jnp.concatenate(
                        [sc, jnp.full((bmax - n, C), -jnp.inf, sc.dtype)])
                t, i = index_mod.exact_rerank(emb, qc, cc, sc, kk, pv)
                outs.append((t[:n], i[:n]))
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
        if idx is None:
            idx = self._flat_pred_index()
        return index_mod._leaf_lp_rerank(idx, q, cand.astype(jnp.int32),
                                         cand_scores, kk)

    def _fused_chunked(self, fidx, q, k: int, *, approx: bool,
                       score_dtype: str):
        """Fused sweep with the query batch chunked to keep the (Bc, Sp)
        score matrix under ``fused_score_budget`` bytes.  Top-k rows are
        independent, so chunking changes results only by GEMM-shape
        accumulation order (~1e-4 on near-ties); chunks dispatch async
        and concatenate on device.  Ragged tails are zero-padded so
        every chunk reuses one compiled program."""
        B = q.shape[0]
        row = fidx.num_slots * jnp.dtype(score_dtype).itemsize
        bmax = max(64, int(self.fused_score_budget) // max(row, 1))
        if bmax < B:  # power of two: program reuse across serving batches
            bmax = 1 << (bmax.bit_length() - 1)

        def one(qc):
            return index_mod.fused_query_topk(
                fidx, qc, k, approx=approx,
                recall_target=self.approx_recall_target,
                score_dtype=score_dtype)

        if B <= bmax:
            return one(q)
        outs = []
        for s in range(0, B, bmax):
            qc = q[s:s + bmax]
            n = qc.shape[0]
            if n < bmax:
                qc = jnp.concatenate(
                    [qc, jnp.zeros((bmax - n, q.shape[1]), q.dtype)])
            cs, ids = one(qc)
            outs.append((cs[:n], ids[:n]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    def _product_chunked(self, q, kk: int, pool: int, n_indexed: int,
                         q_store=None):
        """The product serving path through ONE jitted program per chunk
        (index.fused_query_rerank: fused sweep + optional backstop union +
        exact re-rank).  Chunking honors BOTH byte budgets: the (Bc, Sp)
        score matrix (x2 with the backstop) and the (Bc, C, D) re-rank
        gather."""
        fidx = self._fused_index()
        emb = self._emb_device()
        qs = q if q_store is None else q_store
        bs = self._backstop_k(pool, n_indexed)
        wemb = half_n2 = None
        nv = None
        if bs:
            wemb, half_n2 = self._wemb_device()
            nv = jnp.asarray(min(n_indexed, len(self.sentences)), jnp.int32)
        pv = jnp.float32(self.cfg.prior_var)

        B = q.shape[0]
        score_row = fidx.num_slots * \
            jnp.dtype(self.fused_score_dtype).itemsize
        if bs:
            score_row += wemb.shape[0] * 4
        gather_row = (pool + bs) * emb.shape[1] * 4
        bmax = max(32, int(min(self.fused_score_budget // max(score_row, 1),
                               self.rerank_gather_budget
                               // max(gather_row, 1))))
        if bmax < B:
            bmax = 1 << (bmax.bit_length() - 1)

        def one(qc, qsc):
            return index_mod.fused_query_rerank(
                fidx, emb, qc, qsc, kk, pool,
                wemb=wemb, half_norm2=half_n2, n_valid=nv, bs=bs,
                approx=self.approx_pool,
                recall_target=self.approx_recall_target,
                score_dtype=self.fused_score_dtype, prior_var=pv)

        if B <= bmax:
            return one(q, qs)
        outs = []
        for s in range(0, B, bmax):
            qc, qsc = q[s:s + bmax], qs[s:s + bmax]
            n = qc.shape[0]
            if n < bmax:
                qc = jnp.concatenate(
                    [qc, jnp.zeros((bmax - n, q.shape[1]), q.dtype)])
                qsc = jnp.concatenate(
                    [qsc, jnp.zeros((bmax - n, qs.shape[1]), qs.dtype)])
            cs, ids = one(qc, qsc)
            outs.append((cs[:n], ids[:n]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    def _backstop_k(self, pool: int, n_indexed: int) -> int:
        """Backstop pool size for this query (0 = disabled): ``"auto"``
        enables it at ``backstop_threshold``+ sentences in whitener mode
        (the regime where path-score pool membership starts missing and a
        whitened store exists — see the class attr)."""
        bs = self.backstop_pool
        if bs == "auto":
            if (self.whitener is not None and self.store_embeddings
                    and len(self.sentences) >= self.backstop_threshold):
                bs = pool
            else:
                return 0
        bs = int(bs)
        if bs <= 0 or self._wemb_device() is None:
            return 0
        return min(bs, n_indexed)


    def _pallas_topk(self, bidx, idx, q, kk: int, rerank: int,
                     q_store=None):
        """Serve via the Pallas fused sweep, chunking the query batch down
        to a VMEM-fitting size (the kernel holds (B, M)/(B, TS) scratch in
        VMEM, so B is the free knob; chunks dispatch async and concatenate
        on device).  Returns None when even the minimum chunk won't fit —
        the caller falls back to the XLA blocked path."""
        from rag_cobweb_tpu.ops import pallas_query as pq

        bk = self.pallas_block_k
        if rerank and bidx.ivt_b.shape[0] * bk < max(kk, rerank):
            # the kernel's merged pool is NB * block_k candidates; with few
            # blocks it cannot honor the requested re-rank pool — silently
            # truncating it loses recall (caught by the forest stale test)
            return None
        B = q.shape[0]
        bmax = B
        while bmax > 64 and not pq.pallas_fits_vmem(bidx, bmax, bk):
            bmax = (bmax + 1) // 2
        if not pq.pallas_fits_vmem(bidx, bmax, bk):
            return None
        interp = jax.devices()[0].platform == "cpu"

        def one(qc, qsc=None):
            if rerank:
                cs, cand = pq.pallas_blocked_topk(
                    bidx, qc, max(kk, rerank), interpret=interp, block_k=bk)
                cs = jnp.where(cs > pq.NEG / 2, cs, -jnp.inf)
                return self._rerank_step(idx, qc, cand, cs, kk, q_store=qsc)
            return pq.pallas_blocked_topk(bidx, qc, kk, interpret=interp)

        if B <= bmax:
            return one(q, q_store)
        outs = []
        for s in range(0, B, bmax):
            qc = q[s:s + bmax]
            qsc = None if q_store is None else q_store[s:s + bmax]
            n = qc.shape[0]
            if n < bmax:  # pad the ragged tail: one compiled program
                qc = jnp.concatenate(
                    [qc, jnp.zeros((bmax - n, q.shape[1]), q.dtype)])
                if qsc is not None:
                    qsc = jnp.concatenate(
                        [qsc, jnp.zeros((bmax - n, qsc.shape[1]),
                                        qsc.dtype)])
            cs, ids = one(qc, qsc)
            outs.append((cs[:n], ids[:n]))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    def _small_forest_topk(self, q, kk: int, rerank: Optional[int],
                           q_store=None):
        """Forest below ``blocked_threshold``: per-lane merged leaf-lp query
        with the same exact stored-embedding re-rank as the flat engines.
        Leaf log-prob cannot order same-leaf near-duplicates (identical
        lp), so without the polish k=1 self-retrieval loses ~10% on
        clustered data; the pool must also COVER the largest same-score
        leaf (content-routed forests concentrate whole near-dup groups in
        one leaf), so auto uses the full ``rerank_candidates`` pool — at
        small-corpus scale the exact re-rank gather is ~free.  ``rerank``:
        pool size; None = auto (only when the vector store exists); 0 =
        raw leaf-lp order."""
        fidx = self.forest.build_index()
        from rag_cobweb_tpu.parallel.vforest import _vforest_query
        pool = rerank
        if pool is None:
            pool = (min(max(4 * kk, self.rerank_candidates),
                        len(self.sentences))
                    if self._emb_device() is not None else 0)
        if pool and self._emb_device() is not None:
            cs, cand = _vforest_query(fidx, q, min(max(pool, kk),
                                                   len(self.sentences)))
            return self._rerank_step(fidx, q, cand, cs, kk, q_store=q_store)
        return _vforest_query(fidx, q, kk)

    def _auto_rerank(self) -> int:
        """Default re-rank pool: on above ``rerank_threshold`` sentences —
        and at EVERY size when ``cfg.absorb_depth`` is set (chain compaction
        merges near-duplicate groups into shared leaves whose path scores
        tie; the exact stored-embedding re-rank is what orders them) or a
        ``whitener`` is attached (whitener mode's contract is raw-space
        ranking, which only the exact re-rank provides)."""
        if self.cfg.absorb_depth or (self.whitener is not None
                                     and self.store_embeddings):
            return self.rerank_candidates
        return (self.rerank_candidates
                if len(self.sentences) >= self.rerank_threshold else 0)

    def query_ids(self, queries, k: int, rerank: Optional[int] = None):
        """Batched serving API: (B, D) embeddings -> (B, k) sentence-id
        DEVICE array, routed through the same engine dispatch as
        ``predict_fast`` (Pallas/blocked/gather + auto re-rank).  Returning
        the device array lets evaluators pipeline batches without a host
        sync per batch."""
        qs = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        q = self._whiten_device(qs) if self.whitener is not None else qs
        kk = min(k, len(self.sentences))
        if (self.forest is not None
                and len(self.sentences) < self.blocked_threshold):
            if self._unindexed_count():
                self._flush_pending()   # small scale: rebuild is cheap
            return self._small_forest_topk(q, kk, rerank, q_store=qs)[1]
        if self._unindexed_count() and rerank == 0:
            self._flush_pending()   # explicit rerank=0 = path-score order
        if rerank is None:
            rerank = self._auto_rerank()
        if not self._unindexed_count():
            return self._engine_topk(q, kk, rerank, tie_noise=False,
                                     q_store=qs)[1]
        # stale-serve: indexed candidates + exact closed-form pending/delta
        # pools merge by the shared key — still EXACT ranking semantics
        rerank = rerank or self.rerank_candidates
        kk_old = min(kk, self._indexed_count())
        top_s, top_ids = self._engine_topk(q, kk_old, rerank,
                                           tie_noise=False, q_store=qs)
        return jnp.asarray(self._merge_pending(qs, top_s, top_ids, kk))

    def predict_fast(self, input, k=5, return_ids=False, is_embedding=False,
                     tie_noise: bool = False, rerank: Optional[int] = None):
        """Indexed prediction (reference cobweb_predict_fast/_indexed :210-265,
        :428-433): one fused scoring+path-sum+top-k device computation,
        batch-first.  Above ``blocked_threshold`` sentences the gather-free
        blocked formulation (pure batched MXU matmuls) is used.

        ``rerank``: take that many path-score candidates and re-rank them by
        leaf log-probability (the beam-search key) before the final top-k —
        recovers beam-level recall at scale for ~no extra latency.  ``None``
        = auto (on above ``rerank_threshold`` sentences), ``0`` = off.
        """
        q, qs, single = self._as_query_batch(input, is_embedding,
                                             with_store=True)
        kk = min(k, len(self.sentences))
        if (self.forest is not None
                and len(self.sentences) < self.blocked_threshold):
            # small forest: per-lane merged query + exact re-rank polish
            if self._unindexed_count():
                self._flush_pending()
            top_ids = np.asarray(
                self._small_forest_topk(q, kk, rerank, q_store=qs)[1])
            out = [
                [i if return_ids else self.sentences[i] for i in row if i >= 0]
                for row in np.asarray(top_ids).tolist()
            ]
            return out[0] if single else out
        # shared indexed path: single-tree, or forest-at-scale through the
        # flattened index — both serve the Pallas/blocked engine stack and
        # both support stale-index + pending-closed-form serving
        if self._unindexed_count() and (tie_noise or rerank == 0):
            # tie-noise needs the exact index; an EXPLICIT rerank=0 asks for
            # path-score ranking, which the pending merge (leaf-lp keyed)
            # would silently override — flush instead of changing semantics.
            self._flush_pending()
        if rerank is None:
            rerank = self._auto_rerank()
        if self._unindexed_count():
            # stale-index serve: rerank scores are the exact closed form —
            # the same scale the pending/delta pools produce, so the merge
            # is exact
            rerank = rerank or self.rerank_candidates
        kk_old = min(kk, self._indexed_count())
        top_s, top_ids = self._engine_topk(q, kk_old, rerank, tie_noise,
                                           q_store=qs)
        if self._unindexed_count():
            top_ids = self._merge_pending(qs, top_s, top_ids, kk)
        ids = np.asarray(top_ids)
        out = [
            [i if return_ids else self.sentences[i] for i in row]
            for row in ids.tolist()
        ]
        return out[0] if single else out

    def _merge_pending(self, q, top_s, top_ids, k: int) -> np.ndarray:
        """Merge stale-index candidates with exact unindexed-row scores
        (all three pools share the fresh-leaf closed-form key) ->
        (B, k) sentence ids.  Pools: tier-0 pending (broadcast form),
        tier-1 consolidated delta segment (GEMM form)."""
        all_s = [np.asarray(top_s)]
        all_ids = [np.asarray(top_ids)]
        n_p = len(self._pending_sids)
        if n_p:
            vecs = self._pending_vecs
            n_pad = max(8, 1 << (n_p - 1).bit_length())  # bucketed shape
            vp = np.zeros((n_pad, vecs.shape[1]), np.float32)
            vp[:n_p] = vecs[:n_p]
            valid = np.zeros((n_pad,), bool)
            valid[:n_p] = True
            lp = index_mod.pending_leaf_lp(
                q, jnp.asarray(vp), jnp.asarray(valid),
                jnp.float32(self.cfg.prior_var),
            )
            ps, ppos = jax.lax.top_k(lp, min(k, n_pad))
            all_s.append(np.asarray(ps))
            all_ids.append(np.asarray(
                self._pending_sids + [0] * (n_pad - n_p))[np.asarray(ppos)])
        if self._delta_n:
            ds, dpos = index_mod.delta_exact_topk(
                q, self._delta_vecs, jnp.int32(self._delta_n),
                jnp.float32(self.cfg.prior_var), min(k, self._delta_n))
            all_s.append(np.asarray(ds))
            all_ids.append(self._delta_sids[
                np.asarray(dpos).clip(0, self._delta_n - 1)])
        all_s = np.concatenate(all_s, axis=1)
        all_ids = np.concatenate(all_ids, axis=1)
        order = np.argsort(-all_s, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(all_ids, order, axis=1)

    # reference-compatible aliases
    cobweb_predict_fast = predict_fast
    cobweb_predict_indexed = predict_fast

    def predict(self, input, k=5, return_ids=False, is_embedding=False,
                beam_width: int = 64, beam_lanes: Optional[int] = None):
        """Tree-search prediction (reference cobweb_predict :435-461) as a
        batched beam search down the concept hierarchy.  ``beam_lanes``:
        content-routed forests descend only that many nearest lanes per
        query (None = auto; ignored in single-tree mode)."""
        self._flush_pending()   # beam needs the exact index
        q, single = self._as_query_batch(input, is_embedding)
        if self.forest is not None:
            sids = self.forest.beam_topk(np.asarray(q), k,
                                         beam_width=beam_width,
                                         lanes_per_query=beam_lanes)
            out = [
                [i if return_ids else self.sentences[i] for i in row if i >= 0]
                for row in sids.tolist()
            ]
            return out[0] if single else out
        # bucket the scan depth (multiple of 4) so a deepening tree reuses
        # compiled beam programs
        max_depth = -(-max(self.max_depth, 1) // 4) * 4
        sids = np.asarray(index_mod.beam_query_ids(
            self._beam_index(), q, k, beam_width=beam_width,
            max_depth=max_depth))
        out = [
            [i if return_ids else self.sentences[i] for i in row if i >= 0]
            for row in sids.tolist()
        ]
        return out[0] if single else out

    cobweb_predict = predict

    def rank_scores(self, input, is_embedding=False) -> jnp.ndarray:
        """Differentiable per-sentence scores (reference cobweb_rank_scores
        :267-294).  (B, D) -> (B, S); single input -> (S,).  Differentiable
        w.r.t. the query embedding — used as logits by training/query_train."""
        self._flush_pending()   # (B, S) scores must cover every sentence
        q, single = self._as_query_batch(input, is_embedding)
        if self.forest is not None:
            scores = self.forest.rank_scores(q)
        else:
            idx = self.build_prediction_index()
            scores = index_mod.rank_scores(idx, q)
        return scores[0] if single else scores

    cobweb_rank_scores = rank_scores

    # ------------------------------------------------------------------ #
    # level-weight schedules (reference :335-420)                        #
    # ------------------------------------------------------------------ #
    def set_level_weights(self, weights: Sequence[float]):
        self._level_weights = list(weights)
        self._weight_schedule = None
        self._invalidate_index()

    def set_weight_schedule(self, schedule_type: str, max_depth: int = 10,
                            **kwargs):
        if self._index is not None:
            max_depth = max(self.max_depth, 1)
        self._weight_schedule = schedule_type
        self._schedule_params = kwargs
        self._level_weights = _generate_weight_schedule(
            schedule_type, max_depth, **kwargs
        )
        self._invalidate_index()

    def get_level_weights(self):
        return self._level_weights or [1.0, 1.0, 1.0, 1.0]

    def get_weight_schedule_info(self):
        return {
            "schedule_type": self._weight_schedule,
            "schedule_params": self._schedule_params,
            "current_weights": self.get_level_weights(),
        }

    # ------------------------------------------------------------------ #
    # persistence (reference :484-555)                                   #
    # ------------------------------------------------------------------ #
    def _require_single_tree(self, what: str):
        if self.forest is not None:
            raise ValueError(
                f"{what} requires single-tree mode (n_subtrees=1); forest "
                "mode persists via save()/load() (npz)"
            )

    def dump_json(self, save_path: Optional[str] = None) -> str:
        self._require_single_tree("dump_json")
        sids_by_leaf: dict[int, list[int]] = {}
        for sid, leaf in enumerate(self.leaf_of_sentence):
            sids_by_leaf.setdefault(leaf, []).append(sid)
        state = {
            "tree": json.loads(self.tree.dump_json(sids_by_leaf)),
            "sentences": self.sentences,
            "embedding_dim": self.cfg.dim,
        }
        blob = json.dumps(state, indent=2)
        if save_path:
            with open(save_path, "w") as f:
                f.write(blob)
        return blob

    @staticmethod
    def load_json(json_data, encode_func: Callable = _identity_encode
                  ) -> "CobwebIndex":
        data = json.loads(json_data) if isinstance(json_data, str) else json_data
        tree, leaf_sids = CobwebTree.load_json(json.dumps(data["tree"]))
        obj = CobwebIndex.__new__(CobwebIndex)
        obj.encode_func = encode_func
        obj.whitener = None   # JSON schema is reference-parity: no whitener
        obj.sentences = data.get("sentences", [])
        obj.cfg = tree.cfg
        obj.tree = tree
        obj.forest = None
        obj.n_subtrees = 1
        leaf_of = np.full((len(obj.sentences),), -1, np.int64)
        for leaf, sids in leaf_sids.items():
            for sid in sids:
                leaf_of[sid] = leaf
        obj.leaf_of_sentence = [int(l) for l in leaf_of]
        obj._index = None
        obj._blocked = None
        obj._init_vec_store()
        obj._init_pending()
        obj.blocked_threshold = 8192
        obj._level_weights = None
        obj._weight_schedule = None
        obj._schedule_params = {}
        obj.max_depth = 0
        return obj

    def save(self, path: str):
        """Binary checkpoint (npz tree state + sentence bookkeeping) — the
        scalable alternative to the reference-schema ``dump_json``.  Works
        in both single-tree and forest mode."""
        extras = dict(
            sentences=np.asarray(
                [s if s is not None else "" for s in self.sentences],
                dtype=object,
            ),
            sentence_is_none=np.asarray(
                [s is None for s in self.sentences], bool
            ),
        )
        if self.store_embeddings and self._vec_chunks:
            if len(self._vec_chunks) > 1:
                self._vec_chunks = [np.concatenate(self._vec_chunks)]
            if self._vec_chunks[0].shape[0] == len(self.sentences):
                extras["vectors"] = self._vec_chunks[0]
        if self.whitener is not None:
            import pickle
            extras["whitener_pickle"] = np.frombuffer(
                pickle.dumps(self.whitener), np.uint8)
        if self.forest is not None:
            self.forest.save_npz(path, **extras)
        else:
            self.tree.save_npz(
                path,
                leaf_of_sentence=np.asarray(self.leaf_of_sentence, np.int64),
                **extras,
            )

    @staticmethod
    def load(path: str, encode_func: Callable = _identity_encode
             ) -> "CobwebIndex":
        with np.load(path, allow_pickle=True) as probe:
            is_forest = "__forest__" in probe.files
        if is_forest:
            from rag_cobweb_tpu.parallel.vforest import VForest
            forest, extras = VForest.load_npz(path)
            obj = CobwebIndex.__new__(CobwebIndex)
            obj.encode_func = encode_func
            obj.cfg = forest.cfg
            obj.tree = None
            obj.forest = forest
            obj.n_subtrees = forest.K
            obj.whitener = _load_whitener(extras)
            is_none = extras["sentence_is_none"]
            obj.sentences = [
                None if none else str(s)
                for s, none in zip(extras["sentences"], is_none)
            ]
            obj.leaf_of_sentence = []
            obj._index = None
            obj._blocked = None
            obj._init_vec_store()
            if "vectors" in extras:
                obj._vec_chunks = [np.asarray(extras["vectors"],
                                              np.float32)]
            obj._init_pending()
            obj.blocked_threshold = 8192
            obj._level_weights = None
            obj._weight_schedule = None
            obj._schedule_params = {}
            obj.max_depth = 0
            return obj
        tree, extras = CobwebTree.load_npz(path)
        obj = CobwebIndex.__new__(CobwebIndex)
        obj.encode_func = encode_func
        obj.cfg = tree.cfg
        obj.tree = tree
        obj.forest = None
        obj.n_subtrees = 1
        obj.whitener = _load_whitener(extras)
        is_none = extras["sentence_is_none"]
        obj.sentences = [
            None if none else str(s)
            for s, none in zip(extras["sentences"], is_none)
        ]
        obj.leaf_of_sentence = [int(l) for l in extras["leaf_of_sentence"]]
        obj._index = None
        obj._blocked = None
        obj._init_vec_store()
        if "vectors" in extras:
            obj._vec_chunks = [np.asarray(extras["vectors"], np.float32)]
        obj._init_pending()
        obj.blocked_threshold = 8192
        obj._level_weights = None
        obj._weight_schedule = None
        obj._schedule_params = {}
        obj.max_depth = 0
        return obj

    # ------------------------------------------------------------------ #
    # inspection / viz                                                   #
    # ------------------------------------------------------------------ #
    def __len__(self):
        return len(self.sentences)

    def print_tree(self):
        """Recursive structure print (reference :463-482)."""
        self._require_single_tree("print_tree")
        st = self.tree._host_arrays()
        sids_by_leaf: dict[int, list[int]] = {}
        for sid, leaf in enumerate(self.leaf_of_sentence):
            sids_by_leaf.setdefault(leaf, []).append(sid)

        def rec(n, depth):
            pad = "  " * depth
            sids = sids_by_leaf.get(n, [])
            print(f"{pad}- Node {n} sids={sids}")
            for sid in sids:
                s = self.sentences[sid]
                print(f"{pad}    {s!r}" if s is not None
                      else f"{pad}    [Embedding only]")
            for i in range(int(st.n_children[n])):
                rec(int(st.children[n, i]), depth + 1)

        print("\nCobweb Sentence Clustering Tree:")
        rec(int(st.root), 0)

    def visualize_subtrees(self, directory: str, num_leaves: int = 6):
        """Graphviz PNGs of grandparent subtrees (reference :563-694)."""
        self._require_single_tree("visualize_subtrees")
        from rag_cobweb_tpu.utils.viz import visualize_grandparent_subtrees

        sids_by_leaf: dict[int, list[int]] = {}
        for sid, leaf in enumerate(self.leaf_of_sentence):
            sids_by_leaf.setdefault(leaf, []).append(sid)
        visualize_grandparent_subtrees(
            self.tree, self.sentences, sids_by_leaf, directory,
            num_leaves=num_leaves,
        )


def _generate_weight_schedule(schedule_type: str, max_depth: int, **kwargs):
    """Weight schedules (reference _generate_weight_schedule :368-408):
    constant / linear / quadratic (1/n^2) / exponential (base^i)."""
    if schedule_type == "constant":
        return [kwargs.get("value", 1.0)] * max_depth
    if schedule_type == "linear":
        start = kwargs.get("start", 1.0)
        end = kwargs.get("end", 1.0)
        if kwargs.get("direction", "increase") == "decrease":
            start, end = end, start
        if max_depth == 1:
            return [start]
        step = (end - start) / (max_depth - 1)
        return [start + i * step for i in range(max_depth)]
    if schedule_type == "quadratic":
        start_n = kwargs.get("start_n", 1)
        return [1.0 / (max(start_n + i, 1) ** 2) for i in range(max_depth)]
    if schedule_type == "exponential":
        base = kwargs.get("base", 0.5)
        return [base ** i for i in range(max_depth)]
    raise ValueError(f"Unknown schedule type: {schedule_type}")
