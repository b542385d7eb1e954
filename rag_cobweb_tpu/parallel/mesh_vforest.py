"""K-lane VForest inside every mesh shard: the composed scaling layout.

``parallel/vforest.VForest`` multiplies single-chip insert throughput
K-fold by vmapping K subtrees on one device; ``parallel/forest.CobwebForest``
shards one tree per device over a mesh.  This module composes the two —
N devices x K lanes each = N*K total subtrees — which is the layout the
multi-chip insert-throughput story actually needs (each chip runs its own
vmapped K-lane insert program under ``shard_map``; queries merge lane
candidates on-device, then shard candidates over ICI by ``all_gather``).

The reference has no distributed layer at all (SURVEY.md §2c:
no torch.distributed/NCCL/MPI anywhere); this is first-party new design.

Layout: every TreeState array carries a leading TOTAL-lane axis L = N*K,
sharded ``P("shard")`` — XLA splits it into per-device (K, cap, ...)
blocks, exactly the single-device VForest layout, so the per-device insert
program IS ``vforest.vinsert_rounds_masked`` unchanged.  The cross-shard
query merge key is the candidate's leaf log-probability, calibrated
identically on every lane (same rule as both parent layouts).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core import tree as tree_mod
from rag_cobweb_tpu.parallel.forest import (
    StackedIndex, build_stacked_index, make_mesh)
from rag_cobweb_tpu.parallel import vforest as vf


class MeshVForest:
    """N mesh shards x ``lanes_per_shard`` vmapped subtrees per shard."""

    def __init__(self, cfg: TreeConfig, mesh: Optional[Mesh] = None,
                 lanes_per_shard: int = 4, capacity_per_lane: int = 4096,
                 seed: int = 0, axis_name: str = "shard"):
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        self.axis = axis_name
        self.n_shards = int(self.mesh.devices.size)
        self.K = lanes_per_shard
        self.L = self.n_shards * self.K      # total lanes
        cap = tree_mod.align_capacity(capacity_per_lane)
        L, D, F = self.L, cfg.dim, cfg.max_fanout
        NULL = tree_mod.NULL
        # allocate the stacked state directly at its sharded placement
        # (no K separate inits, no unsharded transient — CLAUDE.md round-3
        # 2x-transient lesson)
        shardings = {}

        def alloc(name, shape, fill, dtype):
            s = NamedSharding(self.mesh, P(self.axis,
                                           *([None] * (len(shape) - 1))))
            shardings[name] = s
            return jax.device_put(jnp.full(shape, fill, dtype), s)

        self.state = tree_mod.TreeState(
            counts=alloc("counts", (L, cap), 0.0, jnp.float32),
            means=alloc("means", (L, cap, D), 0.0, jnp.float32),
            m2s=alloc("m2s", (L, cap, D), 0.0, jnp.float32),
            parent=alloc("parent", (L, cap), NULL, jnp.int32),
            children=alloc("children", (L, cap, F), NULL, jnp.int32),
            n_children=alloc("n_children", (L, cap), 0, jnp.int32),
            root=alloc("root", (L,), 0, jnp.int32),
            n_alloc=alloc("n_alloc", (L,), 1, jnp.int32),
            free_stack=alloc("free_stack", (L, cap), NULL, jnp.int32),
            free_top=alloc("free_top", (L,), 0, jnp.int32),
        )
        self._key = jax.random.PRNGKey(seed)
        self.n_sentences = 0
        self.shard_of: list[int] = []        # actually LANE of (global)
        self.local_sid: list[int] = []
        self._leaf_of_local: list[list[int]] = [[] for _ in range(L)]
        self._stacked_index: Optional[StackedIndex] = None

    # ------------------------------------------------------------------ #
    # insertion                                                          #
    # ------------------------------------------------------------------ #
    def add(self, embeddings: np.ndarray) -> np.ndarray:
        """Round-robin over ALL N*K lanes; every device runs its own
        K-lane vmapped multi-round insert program concurrently."""
        embeddings = np.asarray(embeddings, np.float32)
        B = len(embeddings)
        L = self.L
        gids = np.arange(self.n_sentences, self.n_sentences + B)
        if B == 0:
            return gids
        lane_of = gids % L

        lens = np.bincount(lane_of, minlength=L)
        R_max = int(lens.max())
        Rb = max(4, 1 << (R_max - 1).bit_length())
        order = np.argsort(lane_of, kind="stable")
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        lanes_sorted = lane_of[order]
        pos = np.arange(B) - starts[lanes_sorted]
        D = self.cfg.dim
        xs = np.zeros((L, Rb, D), np.float32)
        mask = np.zeros((L, Rb), bool)
        xs[lanes_sorted, pos] = embeddings[order]
        mask[lanes_sorted, pos] = True
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, L * Rb).reshape(L, Rb, -1)

        def put(a):
            return jax.device_put(jnp.asarray(a), NamedSharding(
                self.mesh, P(self.axis, *([None] * (a.ndim - 1)))))

        self.state, leaves = _mesh_vinsert(self.mesh, self.axis, self.cfg)(
            self.state, put(xs), put(keys), put(mask),
            jnp.asarray(R_max, jnp.int32),
        )
        leaves = np.array(leaves)   # writable copy (jax->np views are RO)
        if (leaves[mask] < 0).any():
            # descents past the deep budget (near-duplicate fringe chains,
            # the depth-96+ case): escalate each failed (lane, slot) to the
            # per-lane exact path — the same fallback single-device
            # VForest.add uses — instead of aborting a composed build whose
            # bookkeeping is already partially applied on device.  Raise
            # only for the truly pathological >_EXACT_STEPS descent.
            keys_np = np.asarray(keys)
            for lane, slot in np.argwhere(mask & (leaves < 0)):
                self.state, lf = vf._insert_one_lane(
                    self.state, jnp.asarray(int(lane), jnp.int32),
                    jnp.asarray(xs[lane, slot]),
                    jnp.asarray(keys_np[lane, slot]), self.cfg,
                )
                if int(lf) < 0:
                    raise RuntimeError(
                        "mesh-vforest insert exceeded the exact scan cap "
                        f"(_EXACT_STEPS={vf._EXACT_STEPS}) in lane "
                        f"{int(lane)} — raise the cap")
                leaves[lane, slot] = int(lf)
            # the exact-path program is a plain jit: re-pin the state to
            # the shard layout the next _mesh_vinsert call expects
            self.state = jax.device_put(self.state, jax.tree.map(
                lambda a: NamedSharding(
                    self.mesh, P(self.axis, *([None] * (a.ndim - 1)))),
                self.state))

        base = np.asarray([len(l) for l in self._leaf_of_local])
        pos_of = np.empty(B, np.int64)
        pos_of[order] = pos
        self.shard_of.extend(int(s) for s in lane_of)
        self.local_sid.extend((base[lane_of] + pos_of).tolist())
        for s in range(L):
            if lens[s]:
                self._leaf_of_local[s].extend(
                    int(x) for x in leaves[s, :lens[s]])
        self.n_sentences += B
        self._stacked_index = None
        return gids

    # ------------------------------------------------------------------ #
    # query                                                              #
    # ------------------------------------------------------------------ #
    def build_index(self) -> StackedIndex:
        """L-lane stacked prediction index, sharded K lanes per device."""
        if self._stacked_index is not None:
            return self._stacked_index
        stacked = build_stacked_index(
            self.cfg, jax.device_get(self.state), self._leaf_of_local,
            self.shard_of, self.local_sid, self.n_sentences,
        )
        self._stacked_index = jax.device_put(stacked, jax.tree.map(
            lambda a: NamedSharding(
                self.mesh, P(self.axis, *([None] * (a.ndim - 1)))),
            stacked,
        ))
        return self._stacked_index

    def query_topk(self, queries: np.ndarray, k: int):
        """(B, D) -> (leaf-lp scores (B, k), global ids (B, k)): per-device
        K-lane merge (vforest rule), then the ICI all_gather shard merge
        (forest rule) — both keyed on calibrated leaf log-prob."""
        idx = self.build_index()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        scores, gids = _mesh_vquery(self.mesh, self.axis, k)(idx, q)
        return np.asarray(scores), np.asarray(gids)


@functools.lru_cache(maxsize=None)
def _mesh_vinsert(mesh: Mesh, axis: str, cfg: TreeConfig):
    """shard_map'd composed insert: each device runs the single-device
    VForest multi-round masked program over its own K-lane state block."""

    def per_shard(state, xs, keys, mask, n_rounds):
        st, leaves = vf.vinsert_rounds_masked(
            state, xs, keys, mask, cfg,
            n_rounds=n_rounds, max_steps=vf._DEEP_STEPS)
        return st, leaves

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(f, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _mesh_vquery(mesh: Mesh, axis: str, k: int):
    """shard_map'd composed query: the single-device K-lane leaf-lp merge
    per shard, then all_gather + global top-k over the mesh axis."""

    def per_shard(idx: StackedIndex, q):
        lp, gids = vf._vforest_query(idx, q, k)        # (B, <=k) local
        all_lp = jax.lax.all_gather(lp, axis)          # (S, B, kk)
        all_ids = jax.lax.all_gather(gids, axis)
        S, B, kk = all_lp.shape
        merged = jnp.transpose(all_lp, (1, 0, 2)).reshape(B, S * kk)
        merged_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, S * kk)
        top, pos = jax.lax.top_k(merged, min(k, S * kk))
        return top, jnp.take_along_axis(merged_ids, pos, axis=1)

    f = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)
