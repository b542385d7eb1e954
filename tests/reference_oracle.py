"""Independent numpy re-implementation of the reference Cobweb algorithm.

This is a *test oracle*: a direct pointer-graph implementation of the math
described in SURVEY.md (Welford/Chan updates, the variance policy, the three
score functions, the four restructure-op utilities, and the descend loop of
CobwebTorchTree.cobweb).  It exists so the flat-array TPU tree can be checked
for exact behavioral parity on small inputs.  Deterministic tie-breaking:
(score, count, -insertion_order) — ties are measure-zero on the random float
data the tests use, so the noise-based tie-break in the TPU build agrees.
"""

from __future__ import annotations

import math

import numpy as np


class OracleNode:
    __slots__ = ("count", "mean", "m2", "children", "parent", "sids")

    def __init__(self, dim):
        self.count = 0.0
        self.mean = np.zeros(dim)
        self.m2 = np.zeros(dim)
        self.children = []
        self.parent = None
        self.sids = []

    def increment(self, x):
        self.count += 1.0
        delta = x - self.mean
        self.mean = self.mean + delta / self.count
        self.m2 = self.m2 + delta * (x - self.mean)

    def absorb_node(self, other):
        delta = other.mean - self.mean
        total = self.count + other.count
        self.m2 = self.m2 + other.m2 + delta * delta * (
            self.count * other.count / total
        )
        self.mean = (self.count * self.mean + other.count * other.mean) / total
        self.count = total


class OracleTree:
    def __init__(self, dim, use_info=True, use_kl=True, acuity_cutoff=False,
                 prior_var=None):
        self.dim = dim
        self.use_info = use_info
        self.use_kl = use_kl
        self.acuity_cutoff = acuity_cutoff
        self.prior_var = (
            prior_var if prior_var is not None else 1.0 / (2 * math.e * math.pi)
        )
        self.root = OracleNode(dim)

    # --- stats helpers ---
    def var(self, m2, count):
        if count <= 0:
            return np.full(self.dim, self.prior_var)
        v = m2 / count
        if self.acuity_cutoff:
            return np.maximum(v, self.prior_var)
        return v + self.prior_var

    def node_mv(self, n):
        return n.mean, self.var(n.m2, n.count)

    def insert_mv(self, n, x):
        count = n.count + 1.0
        delta = x - n.mean
        mean = n.mean + delta / count
        m2 = n.m2 + delta * (x - mean)
        return mean, self.var(m2, count)

    def merge_mv(self, a, b, x):
        delta = b.mean - a.mean
        total = a.count + b.count
        m2 = a.m2 + b.m2 + delta * delta * (a.count * b.count / total)
        mean = (a.count * a.mean + b.count * b.mean) / total
        count = total + 1.0
        delta = x - mean
        mean = mean + delta / count
        m2 = m2 + delta * (x - mean)
        return mean, self.var(m2, count)

    def score(self, mu1, var1, mu2, var2):
        if self.use_info:
            if self.use_kl:
                s = np.sum(np.log(var2) - np.log(var1))
                s += np.sum((var1 + (mu1 - mu2) ** 2) / var2)
                s -= mu1.size
                return s / 2.0
            return 0.5 * np.sum(np.log(var2) - np.log(var1))
        c = 1.0 / (2.0 * math.sqrt(math.pi))
        return np.sum(c / np.sqrt(var2)) - np.sum(c / np.sqrt(var1))

    # --- op utilities ---
    def two_best(self, node, x):
        pm, pv = self.insert_mv(node, x)
        gains = []
        for order, c in enumerate(node.children):
            m, v = self.insert_mv(c, x)
            g = (c.count + 1) / (node.count + 1) * self.score(m, v, pm, pv)
            m, v = self.node_mv(c)
            g -= c.count / (node.count + 1) * self.score(m, v, pm, pv)
            gains.append((g, c.count, -order, c))
        gains.sort(key=lambda t: t[:3], reverse=True)
        best1 = gains[0][3]
        best2 = gains[1][3] if len(gains) > 1 else None
        return self.pu_insert(node, best1, x), best1, best2

    def pu_insert(self, node, child, x):
        pm, pv = self.insert_mv(node, x)
        s = 0.0
        for c in node.children:
            if c is child:
                w = (c.count + 1) / (node.count + 1)
                m, v = self.insert_mv(c, x)
            else:
                w = c.count / (node.count + 1)
                m, v = self.node_mv(c)
            s += w * self.score(m, v, pm, pv)
        return s / len(node.children)

    def pu_new(self, node, x):
        pm, pv = self.insert_mv(node, x)
        s = 0.0
        for c in node.children:
            m, v = self.node_mv(c)
            s += c.count / (node.count + 1) * self.score(m, v, pm, pv)
        s += (1.0 / (node.count + 1)) * self.score(
            x, np.full(self.dim, self.prior_var), pm, pv
        )
        return s / (len(node.children) + 1)

    def pu_merge(self, node, b1, b2, x):
        pm, pv = self.insert_mv(node, x)
        s = 0.0
        for c in node.children:
            if c is b1 or c is b2:
                continue
            m, v = self.node_mv(c)
            s += c.count / (node.count + 1) * self.score(m, v, pm, pv)
        m, v = self.merge_mv(b1, b2, x)
        s += (b1.count + b2.count + 1) / (node.count + 1) * self.score(m, v, pm, pv)
        return s / (len(node.children) - 1)

    def pu_split(self, node, best):
        pm, pv = self.node_mv(node)
        s = 0.0
        for c in node.children:
            if c is best:
                continue
            m, v = self.node_mv(c)
            s += c.count / node.count * self.score(m, v, pm, pv)
        for g in best.children:
            m, v = self.node_mv(g)
            s += g.count / node.count * self.score(m, v, pm, pv)
        return s / (len(node.children) - 1 + len(best.children))

    # --- descent ---
    def is_exact_match(self, node, x):
        if node.count <= 0:
            return False
        std = np.sqrt(node.m2 / node.count)
        if not np.allclose(std, 0.0, rtol=1e-5, atol=1e-8):
            return False
        return np.allclose(x, node.mean, rtol=1e-5, atol=1e-8)

    def ifit(self, x, sid=None):
        x = np.asarray(x, np.float64)
        current = self.root
        while True:
            if not current.children and (
                self.is_exact_match(current, x) or current.count == 0
            ):
                current.increment(x)
                break
            if not current.children:
                new = OracleNode(self.dim)
                new.count, new.mean, new.m2 = (
                    current.count, current.mean.copy(), current.m2.copy()
                )
                new.parent = current.parent
                if new.parent is not None:
                    new.parent.children.remove(current)
                    new.parent.children.append(new)
                else:
                    self.root = new
                current.parent = new
                new.children.append(current)
                new.increment(x)
                leaf = OracleNode(self.dim)
                leaf.parent = new
                leaf.increment(x)
                new.children.append(leaf)
                current = leaf
                break
            best1_pu, best1, best2 = self.two_best(current, x)
            ops = [(best1_pu, 3, "best"), (self.pu_new(current, x), 2, "new")]
            if len(current.children) > 2 and best2 is not None:
                ops.append((self.pu_merge(current, best1, best2, x), 1, "merge"))
            if best1.children:
                ops.append((self.pu_split(current, best1), 0, "split"))
            ops.sort(key=lambda t: t[:2], reverse=True)
            action = ops[0][2]
            if action == "best":
                current.increment(x)
                current = best1
            elif action == "new":
                current.increment(x)
                leaf = OracleNode(self.dim)
                leaf.parent = current
                leaf.increment(x)
                current.children.append(leaf)
                current = leaf
                break
            elif action == "merge":
                current.increment(x)
                m = OracleNode(self.dim)
                m.parent = current
                m.absorb_node(best1)
                m.absorb_node(best2)
                best1.parent = m
                best2.parent = m
                m.children = [best1, best2]
                current.children.remove(best1)
                current.children.remove(best2)
                current.children.append(m)
                current = m
            elif action == "split":
                current.children.remove(best1)
                for g in best1.children:
                    g.parent = current
                    current.children.append(g)
        if sid is not None:
            current.sids.append(sid)
        return current

    def signature(self):
        """Order-invariant structural signature for tree comparison."""

        def sig(n):
            child_sigs = tuple(sorted(sig(c) for c in n.children))
            return (
                round(float(n.count), 4),
                tuple(round(float(v), 4) for v in n.mean),
                child_sigs,
            )

        return sig(self.root)
