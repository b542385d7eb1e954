"""Labeled Cobweb: classification over the concept hierarchy.

Parity with the reference's legacy labeled variant (old_code/
CobwebTorchNode.py:40-44,61-113 per-node ``label_counts`` with alpha
smoothing; old_code/CobwebTorchTree.py:179-235 ``ifit(instance, label)`` /
``fit(instances, labels, iterations)``; :472-530 ``predict_probs`` =
logsumexp over visited nodes of node-score + log label distribution),
which documents the framework's classification + retrieval feature set
(SURVEY.md §2a).

TPU-native redesign:
  * labels ride with sentences, not with incremental node updates — each
    node's label counts are the label mass of the leaves in its subtree,
    which is exactly the steady-state of the reference's path increments
    under the current topology (merge sums children, split redistributes);
    aggregation is one bottom-up pass over the flat arrays;
  * ``predict_probs`` evaluates ALL nodes at once — batched diagonal-
    Gaussian log-probs (two GEMMs) + logsumexp over nodes of
    ``log p(x|node) + log p(label|node)`` — the reference's best-first
    node budget becomes an optional top-M node cut.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.core.tree import CobwebTree
from rag_cobweb_tpu.ops.gaussian import (
    batched_node_log_probs,
    compute_var,
    node_log_prob_terms,
)


class CobwebClassifier:
    def __init__(self, cfg: TreeConfig, capacity: int = 4096, seed: int = 0,
                 alpha: Optional[float] = None):
        self.cfg = cfg
        self.tree = CobwebTree(cfg, capacity=capacity, seed=seed)
        self.alpha = cfg.alpha if alpha is None else alpha
        self.labels: dict = {}           # label -> idx (old_code tree.labels)
        self.reverse_labels: dict = {}   # idx -> label
        self.sentence_labels: list[int] = []
        self.leaf_of_sentence: list[int] = []
        self._cache = None

    # ------------------------------------------------------------------ #
    def _label_idx(self, label) -> int:
        if label not in self.labels:
            idx = len(self.labels)
            self.labels[label] = idx
            self.reverse_labels[idx] = label
        return self.labels[label]

    def fit(self, X, y: Sequence, iterations: int = 1,
            randomize_first: bool = True, seed: int = 0):
        """Batch fit (old_code fit() :204-235: optional shuffling and
        repeated passes; repeated instances land on their exact-match
        leaves)."""
        X = np.asarray(X, np.float32)
        rng = np.random.default_rng(seed)
        for it in range(iterations):
            order = np.arange(len(X))
            if randomize_first and it == 0:
                rng.shuffle(order)
            self.partial_fit(X[order], [y[i] for i in order])
        return self

    def partial_fit(self, X, y: Sequence):
        X = np.asarray(X, np.float32)
        leaves = self.tree.fit(X)
        self.leaf_of_sentence.extend(int(l) for l in leaves)
        self.sentence_labels.extend(self._label_idx(lbl) for lbl in y)
        self._cache = None
        return self

    @property
    def n_labels(self) -> int:
        return len(self.labels)

    # ------------------------------------------------------------------ #
    def _build_cache(self):
        """Bottom-up subtree label-mass aggregation + GEMM score terms."""
        if self._cache is not None:
            return self._cache
        st = jax.tree.map(np.asarray, self.tree.state)
        L = self.n_labels

        # BFS order (parents before children)
        order = [int(st.root)]
        head = 0
        while head < len(order):
            n = order[head]
            head += 1
            for i in range(int(st.n_children[n])):
                order.append(int(st.children[n, i]))

        counts = np.zeros((st.counts.shape[0], L), np.float64)
        for sid, leaf in enumerate(self.leaf_of_sentence):
            counts[leaf, self.sentence_labels[sid]] += 1.0
        for n in reversed(order):  # children accumulate into parents
            for i in range(int(st.n_children[n])):
                counts[n] += counts[int(st.children[n, i])]

        live = np.asarray(order, np.int32)
        label_counts = counts[live] + self.alpha       # (N_live, L) smoothed
        log_label = np.log(label_counts) - np.log(
            label_counts.sum(axis=1, keepdims=True)
        )

        means = self.tree.state.means[jnp.asarray(live)]
        m2s = self.tree.state.m2s[jnp.asarray(live)]
        ns = self.tree.state.counts[jnp.asarray(live)]
        vars_ = compute_var(m2s, ns[:, None], self.cfg)
        terms = node_log_prob_terms(means, vars_)
        self._cache = (terms, jnp.asarray(log_label, jnp.float32))
        return self._cache

    def predict_probs(self, X, max_nodes: Optional[int] = None) -> np.ndarray:
        """(B, D) -> (B, L) label probabilities.

        logsumexp over nodes of ``log p(x|node) + log p(label|node)``
        (old_code _predict_probs :477-530, with the node budget as an
        optional top-``max_nodes`` cut on node scores instead of a
        best-first heap)."""
        (ivt, movt, const), log_label = self._build_cache()
        X = jnp.asarray(np.atleast_2d(np.asarray(X, np.float32)))
        nlp = batched_node_log_probs(X, ivt, movt, const)   # (B, N)
        if max_nodes is not None and max_nodes < nlp.shape[1]:
            kth = jax.lax.top_k(nlp, max_nodes)[0][:, -1:]
            nlp = jnp.where(nlp >= kth, nlp, -jnp.inf)
        scores = nlp[:, :, None] + log_label[None, :, :]     # (B, N, L)
        logp = jax.nn.logsumexp(scores, axis=1)
        probs = jax.nn.softmax(logp, axis=-1)
        return np.asarray(probs)

    def predict(self, X, max_nodes: Optional[int] = None) -> list:
        probs = self.predict_probs(X, max_nodes)
        return [self.reverse_labels[int(i)] for i in probs.argmax(axis=1)]

    def score(self, X, y) -> float:
        pred = self.predict(X)
        return float(np.mean([p == t for p, t in zip(pred, y)]))

    # ------------------------------------------------------------------ #
    def dump_json(self) -> str:
        """Labeled-tree schema with reverse_labels in the header
        (old_code dump_json :118-135)."""
        sids = {}
        for sid, leaf in enumerate(self.leaf_of_sentence):
            sids.setdefault(leaf, []).append(sid)
        return json.dumps({
            "tree": json.loads(self.tree.dump_json(sids)),
            "reverse_labels": {str(k): v for k, v in
                               self.reverse_labels.items()},
            "sentence_labels": self.sentence_labels,
            "alpha": self.alpha,
        })

    @classmethod
    def load_json(cls, blob: str) -> "CobwebClassifier":
        data = json.loads(blob)
        tree, leaf_sids = CobwebTree.load_json(json.dumps(data["tree"]))
        obj = cls.__new__(cls)
        obj.cfg = tree.cfg
        obj.tree = tree
        obj.alpha = data.get("alpha", tree.cfg.alpha)
        obj.reverse_labels = {int(k): v for k, v in
                              data["reverse_labels"].items()}
        obj.labels = {v: k for k, v in obj.reverse_labels.items()}
        obj.sentence_labels = list(data["sentence_labels"])
        n_sent = len(obj.sentence_labels)
        leaf_of = [0] * n_sent
        for leaf, sids in leaf_sids.items():
            for sid in sids:
                leaf_of[sid] = leaf
        obj.leaf_of_sentence = leaf_of
        obj._cache = None
        return obj
