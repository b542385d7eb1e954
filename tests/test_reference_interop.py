"""Cross-implementation interop proof (VERDICT r4 #3).

Round-trips the reference-compatible JSON schema against the ACTUAL
reference implementation installed at /root/reference (torch is present
on this image):

  A. reference ``CobwebTorchTree`` built with ``ifit`` on ~200 rows ->
     ``dump_json`` (CobwebTorchTree.py:67-81) -> our
     ``CobwebTree.load_json`` -> identical structure and matching
     ``categorize`` results;
  B. our ``CobwebTree`` built with ``fit`` -> ``dump_json`` -> the
     reference's ``load_json`` (CobwebTorchTree.py:94-121) -> matching
     ``categorize`` results.

"Matching categorize" = for every probe the best node returned by each
implementation has the same (count, mean) statistics; near-ties (the one
legitimate divergence source: torch-f32 vs numpy-f32 log-prob summation
order, plus the reference's random() heap tie-break) are accepted only
when the two nodes' log-probs agree to 1e-4 relative — any such case is
counted and bounded.

Both tests are skipped when torch or /root/reference is unavailable, so
the suite stays hermetic elsewhere.
"""

import json
import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if not os.path.isdir(os.path.join(REF_ROOT, "src", "cobweb")):
    pytest.skip("reference checkout not present", allow_module_level=True)

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from src.cobweb.CobwebTorchTree import CobwebTorchTree  # noqa: E402

from rag_cobweb_tpu.core.config import TreeConfig  # noqa: E402
from rag_cobweb_tpu.core.tree import CobwebTree  # noqa: E402

D = 16
N = 200


def _data(seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=3.0, size=(8, D))
    xs = np.concatenate(
        [c + 0.3 * rng.normal(size=(N // 8, D)) for c in centers]
    ).astype(np.float32)
    rng.shuffle(xs)
    probes = np.concatenate(
        [xs[:12], (centers + 0.5 * rng.normal(size=centers.shape)
                   ).astype(np.float32)]
    )
    return xs, probes


def _build_reference(xs):
    tree = CobwebTorchTree(shape=torch.Size([D]))
    for i, x in enumerate(xs):
        leaf = tree.ifit(torch.tensor(x))
        leaf.sentence_id.append(i)   # the CobwebWrapper.add_sentences tag
    return tree

def _ref_node_stats(node):
    return float(node.count), np.asarray(node.mean, np.float32)


def _our_node_stats(tree, n):
    st = tree._host_arrays()
    return float(st.counts[n]), np.asarray(st.means[n], np.float32)


def _ref_log_prob(node, x):
    return float(node.log_prob(torch.tensor(x)))


def _our_log_prob(tree, n, x):
    st = tree._host_arrays()
    cfg = tree.cfg
    count = max(float(st.counts[n]), 1.0)
    var = np.asarray(st.m2s[n], np.float64) / count + cfg.prior_var
    d = np.asarray(x, np.float64) - np.asarray(st.means[n], np.float64)
    return float(-0.5 * np.sum(np.log(var) + math.log(2 * math.pi)
                               + d * d / var))


def _canon_ref(node):
    """Canonical (order-insensitive) recursive form.  Stats round-trip
    EXACTLY through the JSON (f32 -> repr -> f32), so byte equality is the
    right comparison; children are sorted because the reference's own
    ``load_json`` reverses sibling order (stack pop, :108-118) — sibling
    order carries no semantics in either implementation."""
    stats = (float(node.count),
             np.asarray(node.mean, np.float32).tobytes(),
             np.asarray(node.meanSq, np.float32).tobytes(),
             tuple(sorted(node.sentence_id or [])))
    return (stats, tuple(sorted(_canon_ref(c) for c in node.children)))


def _canon_ours(tree, leaf_sids):
    st = tree._host_arrays()

    def rec(n):
        nc = int(st.n_children[n])
        stats = (float(st.counts[n]),
                 np.asarray(st.means[n], np.float32).tobytes(),
                 np.asarray(st.m2s[n], np.float32).tobytes(),
                 tuple(sorted(leaf_sids.get(n, []))))
        kids = tuple(sorted(
            rec(int(st.children[n, i])) for i in range(nc)))
        return (stats, kids)

    return rec(int(st.root))


def _assert_same_structure(ref_tree, our_tree, leaf_sids):
    assert _canon_ref(ref_tree.root) == _canon_ours(our_tree, leaf_sids)


def _assert_categorize_parity(ref_tree, our_tree, probes):
    near_ties = 0
    for x in probes:
        rbest = ref_tree.categorize(torch.tensor(x), use_best=True)
        obest = our_tree.categorize(x)
        rcount, rmean = _ref_node_stats(rbest)
        ocount, omean = _our_node_stats(our_tree, obest)
        if rcount == ocount and np.allclose(rmean, omean, atol=1e-6):
            continue
        # divergence must be a numeric near-tie, not a different answer
        rlp = _ref_log_prob(rbest, x)
        olp = _our_log_prob(our_tree, obest, x)
        assert abs(rlp - olp) <= 1e-4 * max(abs(rlp), abs(olp), 1.0), (
            f"categorize diverged beyond tie tolerance: ref lp={rlp} "
            f"(count={rcount}) vs ours lp={olp} (count={ocount})"
        )
        near_ties += 1
    assert near_ties <= max(2, len(probes) // 10), (
        f"{near_ties}/{len(probes)} probes resolved only by tie tolerance"
    )


def test_reference_to_ours_roundtrip():
    xs, probes = _data(0)
    ref = _build_reference(xs)
    js = ref.dump_json()

    ours, leaf_sids = CobwebTree.load_json(js)

    # header fields really round-tripped
    hdr = json.loads(js)
    assert ours.cfg.use_info == hdr["use_info"]
    assert ours.cfg.use_kl == hdr["use_kl"]
    assert ours.cfg.prior_var == pytest.approx(hdr["prior_var"])

    _assert_same_structure(ref, ours, leaf_sids)
    _assert_categorize_parity(ref, ours, probes)

    # retrieval-level parity: every sentence id the reference stored is
    # reachable through our loaded tree's leaves
    got = sorted(i for sids in leaf_sids.values() for i in sids)
    assert got == list(range(len(xs)))


def test_ours_to_reference_roundtrip():
    xs, probes = _data(1)
    ours = CobwebTree(TreeConfig(dim=D), capacity=4 * N + 16, seed=0)
    leaves = ours.fit(xs)
    leaf_sids: dict = {}
    for i, leaf in enumerate(np.asarray(leaves)):
        leaf_sids.setdefault(int(leaf), []).append(i)
    js = ours.dump_json(leaf_sids)

    ref = CobwebTorchTree(shape=torch.Size([D]))
    ref.load_json(js)

    _assert_same_structure(ref, ours, leaf_sids)
    _assert_categorize_parity(ref, ours, probes)
