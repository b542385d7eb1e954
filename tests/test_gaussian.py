"""Unit tests for the Gaussian sufficient-statistics kernels (ops/gaussian.py)
against straightforward numpy computations."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_cobweb_tpu.core.config import TreeConfig
from rag_cobweb_tpu.ops import gaussian as G


CFG = TreeConfig(dim=8)


def np_var(m2, count, cfg=CFG):
    if count <= 0:
        return np.full_like(m2, cfg.prior_var)
    v = m2 / count
    if cfg.acuity_cutoff:
        return np.maximum(v, cfg.prior_var)
    return v + cfg.prior_var


def random_stats(rng, dim=8, n=None):
    shape = (dim,) if n is None else (n, dim)
    count = rng.integers(1, 50, size=() if n is None else (n,)).astype(np.float32)
    mean = rng.normal(size=shape).astype(np.float32)
    m2 = (rng.random(shape) * count[..., None] if n else rng.random(shape) * count).astype(np.float32)
    return G.GaussStats(jnp.asarray(count), jnp.asarray(mean), jnp.asarray(m2))


def test_welford_insert_matches_batch_mean_var():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(30, 8)).astype(np.float32)
    s = G.empty_stats(8)
    for x in xs:
        s = G.welford_insert(s, jnp.asarray(x))
    assert float(s.count) == 30
    np.testing.assert_allclose(np.asarray(s.mean), xs.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.m2), ((xs - xs.mean(0)) ** 2).sum(0), rtol=1e-4, atol=1e-4
    )


def test_chan_merge_equals_joint_stats():
    rng = np.random.default_rng(1)
    a_data = rng.normal(size=(12, 8)).astype(np.float32)
    b_data = rng.normal(size=(20, 8)).astype(np.float32)

    def fold(data):
        s = G.empty_stats(8)
        for x in data:
            s = G.welford_insert(s, jnp.asarray(x))
        return s

    merged = G.chan_merge(fold(a_data), fold(b_data))
    joint = np.concatenate([a_data, b_data])
    np.testing.assert_allclose(np.asarray(merged.mean), joint.mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(merged.m2), ((joint - joint.mean(0)) ** 2).sum(0), rtol=1e-4, atol=1e-4
    )


def test_chan_merge_batched():
    rng = np.random.default_rng(2)
    a = random_stats(rng, n=5)
    b = random_stats(rng, n=5)
    out = G.chan_merge(a, b)
    for i in range(5):
        ai = jax.tree.map(lambda t: t[i], a)
        bi = jax.tree.map(lambda t: t[i], b)
        oi = G.chan_merge(ai, bi)
        np.testing.assert_allclose(np.asarray(out.mean[i]), np.asarray(oi.mean), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.m2[i]), np.asarray(oi.m2), rtol=1e-5)


def test_compute_var_policies():
    m2 = jnp.asarray(np.full((8,), 4.0, np.float32))
    count = jnp.asarray(8.0)
    v = G.compute_var(m2, count, CFG)
    np.testing.assert_allclose(np.asarray(v), 0.5 + CFG.prior_var, rtol=1e-6)

    cfg_cut = TreeConfig(dim=8, acuity_cutoff=True)
    v = G.compute_var(jnp.zeros(8), jnp.asarray(8.0), cfg_cut)
    np.testing.assert_allclose(np.asarray(v), cfg_cut.prior_var, rtol=1e-6)

    # empty concept -> prior variance (CobwebWrapper.py:199-203)
    v = G.compute_var(jnp.zeros(8), jnp.asarray(0.0), CFG)
    np.testing.assert_allclose(np.asarray(v), CFG.prior_var, rtol=1e-6)


def test_log_prob_matches_scipy_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = (rng.random(8) + 0.1).astype(np.float32)
    got = float(G.log_prob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var)))
    want = -0.5 * np.sum(np.log(var) + math.log(2 * math.pi) + (x - mean) ** 2 / var)
    assert got == pytest.approx(want, rel=1e-5)


def test_batched_node_log_probs_matches_direct():
    """The two-GEMM form must equal the broadcast form (minus the 2*pi term
    which the reference prediction index also drops, CobwebWrapper.py:230-236)."""
    rng = np.random.default_rng(4)
    B, N, D = 7, 13, 8
    x = rng.normal(size=(B, D)).astype(np.float32)
    mean = rng.normal(size=(N, D)).astype(np.float32)
    var = (rng.random((N, D)) + 0.1).astype(np.float32)

    ivt, movt, const = G.node_log_prob_terms(jnp.asarray(mean), jnp.asarray(var))
    got = np.asarray(G.batched_node_log_probs(jnp.asarray(x), ivt, movt, const))

    want = -0.5 * (
        np.log(var).sum(-1)[None, :]
        + ((x[:, None, :] - mean[None, :, :]) ** 2 / var[None, :, :]).sum(-1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "use_info,use_kl", [(True, True), (True, False), (False, False)]
)
def test_compute_score_variants(use_info, use_kl):
    cfg = TreeConfig(dim=8, use_info=use_info, use_kl=use_kl)
    rng = np.random.default_rng(5)
    mu1 = rng.normal(size=8)
    mu2 = rng.normal(size=8)
    var1 = rng.random(8) + 0.1
    var2 = rng.random(8) + 0.1

    got = float(
        G.compute_score(
            jnp.asarray(mu1, jnp.float32), jnp.asarray(var1, jnp.float32),
            jnp.asarray(mu2, jnp.float32), jnp.asarray(var2, jnp.float32), cfg
        )
    )
    if use_info and use_kl:
        want = 0.5 * (
            np.sum(np.log(var2) - np.log(var1))
            + np.sum((var1 + (mu1 - mu2) ** 2) / var2)
            - 8
        )
    elif use_info:
        want = 0.5 * np.sum(np.log(var2) - np.log(var1))
    else:
        c = 1 / (2 * math.sqrt(math.pi))
        want = np.sum(c / np.sqrt(var2)) - np.sum(c / np.sqrt(var1))
    assert got == pytest.approx(want, rel=1e-4)


def test_kl_score_is_true_kl():
    """use_info+use_kl is exactly KL(N1 || N2) for diagonal Gaussians."""
    rng = np.random.default_rng(6)
    mu1, mu2 = rng.normal(size=8), rng.normal(size=8)
    var1, var2 = rng.random(8) + 0.1, rng.random(8) + 0.1
    kl = 0.5 * np.sum(
        np.log(var2 / var1) + (var1 + (mu1 - mu2) ** 2) / var2 - 1.0
    )
    got = float(
        G.compute_score(
            jnp.asarray(mu1, jnp.float32), jnp.asarray(var1, jnp.float32),
            jnp.asarray(mu2, jnp.float32), jnp.asarray(var2, jnp.float32), CFG
        )
    )
    assert got == pytest.approx(kl, rel=1e-4)
