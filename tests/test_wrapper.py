"""Tests for the CobwebIndex facade: reference CobwebWrapper API parity,
round-trip persistence, weight schedules, and the sample-corpus smoke flow
(the reference's only test, tests/cobweb_basic_test.py, with assertions)."""

import json

import numpy as np
import pytest

from rag_cobweb_tpu import CobwebIndex, TreeConfig
from rag_cobweb_tpu.bench.datasets import load_sample_corpuses


def fake_encode(sentences):
    """Deterministic hash-based embedding: hermetic stand-in for a
    SentenceTransformer (the encode_func seam, CobwebWrapper.py:13)."""
    out = np.zeros((len(sentences), 32), np.float32)
    for i, s in enumerate(sentences):
        rng = np.random.default_rng(abs(hash(s)) % (2**31))
        out[i] = rng.normal(size=32)
    return out


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=3.0, size=(5, 24))
    embs = np.concatenate(
        [c + 0.2 * rng.normal(size=(12, 24)) for c in centers]
    ).astype(np.float32)
    sentences = [f"sentence {i}" for i in range(len(embs))]
    return CobwebIndex(sentences, embs), embs, sentences


def test_predict_fast_returns_sentences(db):
    idx, embs, sentences = db
    out = idx.predict_fast(embs[0], k=3, is_embedding=True)
    assert len(out) == 3
    assert out[0] == sentences[0]


def test_predict_fast_batch(db):
    idx, embs, sentences = db
    out = idx.predict_fast(embs[:4], k=3, is_embedding=True)
    assert len(out) == 4 and all(len(r) == 3 for r in out)
    assert out[1][0] == sentences[1]


def test_predict_tree_search(db):
    idx, embs, sentences = db
    out = idx.predict(embs[2], k=5, is_embedding=True, return_ids=True)
    assert 2 in out


def test_rank_scores_shape_and_argmax(db):
    idx, embs, sentences = db
    s = idx.rank_scores(embs[7], is_embedding=True)
    assert s.shape == (len(sentences),)
    assert int(np.argmax(np.asarray(s))) == 7


def test_incremental_add(db):
    rng = np.random.default_rng(9)
    embs = rng.normal(size=(10, 8)).astype(np.float32)
    idx = CobwebIndex([f"s{i}" for i in range(10)], embs)
    more = rng.normal(size=(5, 8)).astype(np.float32)
    idx.add_sentences([f"t{i}" for i in range(5)], more)
    assert len(idx) == 15
    out = idx.predict_fast(more[0], k=1, is_embedding=True)
    assert out[0] == "t0"


def test_json_round_trip(db):
    idx, embs, sentences = db
    blob = idx.dump_json()
    loaded = CobwebIndex.load_json(blob)
    assert len(loaded) == len(idx)
    a = idx.predict_fast(embs[5], k=5, is_embedding=True)
    b = loaded.predict_fast(embs[5], k=5, is_embedding=True)
    assert a == b
    # schema parity with the reference (CobwebWrapper.dump_json :489-497)
    data = json.loads(blob)
    assert set(data) == {"tree", "sentences", "embedding_dim"}
    assert {"count", "mean", "meanSq", "sentence_id", "children"} <= set(
        data["tree"]["root"]
    )


def test_weight_schedules():
    from rag_cobweb_tpu.core.wrapper import _generate_weight_schedule as gen

    assert gen("constant", 4) == [1.0] * 4
    assert gen("linear", 3, start=0.0, end=1.0) == [0.0, 0.5, 1.0]
    assert gen("linear", 3, start=0.0, end=1.0, direction="decrease") == [
        1.0, 0.5, 0.0]
    assert gen("quadratic", 3) == [1.0, 0.25, 1 / 9]
    assert gen("exponential", 3, base=0.5) == [1.0, 0.5, 0.25]
    with pytest.raises(ValueError):
        gen("bogus", 3)


def test_set_weight_schedule_changes_scores(db):
    idx, embs, sentences = db
    base = idx.predict_fast(embs[0], k=3, is_embedding=True)
    idx.set_weight_schedule("exponential", base=0.5)
    after = idx.predict_fast(embs[0], k=3, is_embedding=True)
    assert idx.get_weight_schedule_info()["schedule_type"] == "exponential"
    idx.set_level_weights([1.0] * 6)  # restore
    restored = idx.predict_fast(embs[0], k=3, is_embedding=True)
    assert restored == base


def test_embedding_only_rows():
    rng = np.random.default_rng(3)
    embs = rng.normal(size=(8, 6)).astype(np.float32)
    idx = CobwebIndex(corpus=None, corpus_embeddings=embs)
    out = idx.predict_fast(embs[1], k=2, is_embedding=True, return_ids=True)
    assert out[0] == 1


def test_smoke_sample_corpus():
    """The reference's smoke test (tests/cobweb_basic_test.py:5-77) with a
    hermetic encoder and real assertions."""
    corpus = load_sample_corpuses()["user_corpus2"]
    idx = CobwebIndex(corpus, fake_encode(corpus), encode_func=fake_encode)
    query = corpus[0]
    slow = idx.predict(query, k=3)
    fast = idx.predict_fast(query, k=3)
    assert corpus[0] in slow and corpus[0] in fast
    blob = idx.dump_json()
    loaded = CobwebIndex.load_json(blob, encode_func=fake_encode)
    assert loaded.predict_fast(query, k=3) == fast


def test_fast_build_deprecated_falls_back():
    """fast_build was retired (bulk path removed): the flag must warn and
    fall back to the exact insert path with identical results."""
    rng = np.random.default_rng(12)
    centers = rng.normal(scale=3.0, size=(6, 16))
    embs = np.concatenate(
        [c + 0.2 * rng.normal(size=(80, 16)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(embs))
    embs = embs[order]
    idx = CobwebIndex(corpus=None, corpus_embeddings=embs[:64],
                      config=TreeConfig(dim=16), capacity=4096)
    with pytest.warns(DeprecationWarning):
        idx.add_sentences([None] * (len(embs) - 64), embs[64:],
                          fast_build=True)
    assert len(idx) == len(embs)
    out = idx.predict_fast(embs[100], k=3, is_embedding=True,
                           return_ids=True)
    assert 100 in out


def test_stale_pending_add_then_query():
    """add_sentences after an index build must serve queries WITHOUT an
    index rebuild (bounded-staleness pending buffer): the new sentences are
    scored by their fresh-leaf closed form and merged by leaf log-prob."""
    rng = np.random.default_rng(3)
    D = 16
    centers = rng.normal(scale=4.0, size=(8, D)).astype(np.float32)
    base = np.concatenate([
        c + 0.2 * rng.normal(size=(40, D)) for c in centers
    ]).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=base, config=TreeConfig(dim=D))
    db.predict_fast(base[0], k=3, is_embedding=True)   # builds the index
    assert db._index is not None

    new = (centers[3] + 0.2 * rng.normal(size=(20, D))).astype(np.float32)
    db.add_sentences([None] * len(new), new)
    assert db._pending_sids, "adds should land in the pending buffer"
    assert db._index is not None, "stale index must survive the add"

    # a query AT a pending embedding must retrieve that pending sid first
    sid0 = len(base)
    got = db.predict_fast(new[0], k=5, is_embedding=True, return_ids=True)
    assert got[0] == sid0, got
    # old sentences still retrievable through the stale index
    got_old = db.predict_fast(base[7], k=5, is_embedding=True,
                              return_ids=True)
    assert 7 in got_old or got_old[0] // 40 == 0, got_old

    # exact-index consumers flush the pending buffer
    scores = db.rank_scores(new[0], is_embedding=True)
    assert not db._pending_sids
    assert scores.shape[0] == len(base) + len(new)
    got2 = db.predict_fast(new[0], k=5, is_embedding=True, return_ids=True)
    assert got2[0] == sid0, (got, got2)


def test_pallas_engine_routing():
    """predict_fast must serve the Pallas fused sweep (interpret mode on
    CPU) when the corpus exceeds pallas_threshold and the kernel fits
    VMEM — the fastest engine is the product, not a script-only path."""
    rng = np.random.default_rng(11)
    D = 16
    centers = rng.normal(scale=4.0, size=(8, D)).astype(np.float32)
    embs = np.concatenate([
        c + 0.2 * rng.normal(size=(40, D)) for c in centers
    ]).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=embs, config=TreeConfig(dim=D))
    db.blocked_threshold = 64          # force the blocked/Pallas regime
    db.pallas_threshold = 64           # (default gates on 1M-scale serving)
    db.use_pallas = True               # opt-in engine (default XLA+approx)

    import rag_cobweb_tpu.ops.pallas_query as pq
    calls = {"n": 0}
    orig = pq.pallas_blocked_topk

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    pq.pallas_blocked_topk, saved = spy, orig
    try:
        got = db.predict_fast(embs[5], k=5, is_embedding=True,
                              return_ids=True)
        assert calls["n"] == 1, "predict_fast did not route through Pallas"
        assert 5 in got, got
        # rerank path (pool + exact rerank) also routes through Pallas
        # (pool <= NB * block_k so the kernel can honor it; larger pools
        # fall back to the XLA sweep by design)
        got_rr = db.predict_fast(embs[17], k=5, is_embedding=True,
                                 return_ids=True, rerank=16)
        assert calls["n"] == 2
        assert 17 in got_rr, got_rr
        # batched serving API: device array out, same engine
        ids = np.asarray(db.query_ids(embs[:8], k=10, rerank=16))
        assert ids.shape == (8, 10)
        assert calls["n"] == 3
        hits = sum(b in ids[b] for b in range(8))
        assert hits >= 6, (hits, ids)
    finally:
        pq.pallas_blocked_topk = saved

    # pinning use_pallas=False falls back to the XLA blocked path
    db.use_pallas = False
    got_xla = db.predict_fast(embs[5], k=5, is_embedding=True,
                              return_ids=True)
    assert 5 in got_xla


def test_explicit_rerank0_flushes_pending():
    """An explicit rerank=0 asks for path-score ranking; with a pending
    buffer the merge would silently switch semantics — it must flush."""
    rng = np.random.default_rng(5)
    D = 16
    embs = rng.normal(size=(200, D)).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=embs, config=TreeConfig(dim=D))
    db.predict_fast(embs[0], k=3, is_embedding=True)
    db.add_sentences([None], rng.normal(size=(1, D)).astype(np.float32))
    assert db._pending_sids
    db.predict_fast(embs[0], k=3, is_embedding=True, rerank=0)
    assert not db._pending_sids, "explicit rerank=0 must flush pending"


def test_host_struct_rebuild_no_stale_reuse():
    """Regression for the _HOST_STRUCT id()-aliasing hazard: build, drop,
    and rebuild indexes repeatedly; the blocked build must always consume
    the CURRENT tree's structure (and the cache must not leak entries)."""
    from rag_cobweb_tpu.core import index as index_mod

    rng = np.random.default_rng(7)
    D = 12
    n0 = len(index_mod._HOST_STRUCT)
    for round_i in range(4):
        embs = rng.normal(scale=3.0, size=(60 + 10 * round_i, D)
                          ).astype(np.float32)
        db = CobwebIndex(corpus_embeddings=embs, config=TreeConfig(dim=D))
        idx = db.build_prediction_index()
        bidx = index_mod.build_blocked_index(idx, block_size=32)
        # blocked result must match the gather-path result for THIS tree
        import jax.numpy as jnp
        q = jnp.asarray(embs[:8])
        _, want = index_mod.query_topk(idx, q, 3)
        _, got = index_mod.blocked_query_topk(bidx, q, 3)
        for b in range(8):
            assert set(np.asarray(got)[b]) == set(np.asarray(want)[b])
        del db, idx, bidx
    import gc
    gc.collect()
    assert len(index_mod._HOST_STRUCT) <= n0 + 1, "host-struct cache leak"


def test_exact_rerank_breaks_near_duplicate_ties():
    """Sentences sharing a leaf (near-duplicates merged by the tree) get
    identical leaf log-probs, so the old leaf-lp re-rank ordered them
    arbitrarily; the stored-embedding EXACT re-rank must rank a
    distance-0 query's gold row first, on every engine route."""
    rng = np.random.default_rng(0)
    D = 24
    base = rng.normal(size=(300, D)).astype(np.float32)
    gold = base[7]
    dups = (gold + 0.001 * rng.normal(size=(15, D))).astype(np.float32)
    corpus = np.concatenate([base, dups]).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=corpus, config=TreeConfig(dim=D))
    q = gold.copy()
    got = db.predict_fast(q, k=3, is_embedding=True, return_ids=True,
                          rerank=64)
    assert got[0] == 7, got
    # blocked / Pallas route
    db.blocked_threshold = 64
    db._blocked = None
    got2 = db.predict_fast(q, k=3, is_embedding=True, return_ids=True,
                           rerank=64)
    assert got2[0] == 7, got2
    # the vector store survives a save/load round trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "db.npz")
        db.save(p)
        db2 = CobwebIndex.load(p)
        assert db2._emb_device() is not None
        got3 = db2.predict_fast(q, k=3, is_embedding=True,
                                return_ids=True, rerank=64)
        assert got3[0] == 7, got3
    # leaf-lp fallback still serves when the store is disabled
    db.store_embeddings = False
    got4 = db.predict_fast(q, k=3, is_embedding=True, return_ids=True,
                           rerank=64)
    assert 7 in got4, got4


def test_forest_stale_pending_add_then_query():
    """Forest mode must also serve add-then-query WITHOUT an index
    rebuild: the retained stale flat index + the pending closed form
    (previously forest adds always invalidated and repaid a full
    flatten + blocked rebuild)."""
    rng = np.random.default_rng(9)
    D = 16
    centers = rng.normal(scale=4.0, size=(8, D)).astype(np.float32)
    base = np.concatenate([
        c + 0.2 * rng.normal(size=(40, D)) for c in centers
    ]).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=base, config=TreeConfig(dim=D),
                     n_subtrees=4)
    db.blocked_threshold = 64          # force the flat-index regime
    # pin the FLAT route (the default forest engine is now the stats-free
    # fused build, covered by test_fused_state.py — this test keeps the
    # retained-flat stale path honest)
    db._flat_pred_index()
    db.predict_fast(base[0], k=3, is_embedding=True)
    assert db._flat_cache is not None

    flat_before = db._flat_cache
    new = (centers[3] + 0.2 * rng.normal(size=(20, D))).astype(np.float32)
    db.add_sentences([None] * len(new), new)
    assert db._pending_sids, "forest adds should land in pending"
    assert db._flat_cache is flat_before, "stale flat index must survive"

    sid0 = len(base)
    got = db.predict_fast(new[0], k=5, is_embedding=True, return_ids=True)
    assert got[0] == sid0, got
    assert db._flat_cache is flat_before, "query must not rebuild"
    # old rows still retrievable through the stale index
    got_old = db.predict_fast(base[7], k=5, is_embedding=True,
                              return_ids=True)
    assert 7 in got_old, got_old
    # the serving API also stale-serves (tiered pending merge shares the
    # exact closed-form key, so ranking semantics stay exact)
    ids = np.asarray(db.query_ids(new[:4], k=5, rerank=64))
    assert db._pending_sids, "query_ids must NOT flush (stale-serve)"
    assert db._flat_cache is flat_before
    assert ids.shape == (4, 5)
    assert ids[0][0] == sid0, ids[0]
    # explicit rerank=0 asks for raw path-score order -> that DOES flush
    db.query_ids(new[:4], k=5, rerank=0)
    assert not db._pending_sids


def test_tiered_delta_kills_pending_overflow_cliff():
    """Tier-0 overflow CONSOLIDATES into the device delta segment
    (index.delta_exact_topk GEMM pool) instead of invalidating the index:
    append-mostly workloads never pay the full flatten+blocked rebuild
    until the (much larger) rebuild threshold.  The old behavior rebuilt
    everything the moment pending crossed stale_pending_limit — a
    60-200 s cliff at 1M."""
    rng = np.random.default_rng(11)
    D = 16
    centers = rng.normal(scale=4.0, size=(8, D)).astype(np.float32)
    base = np.concatenate([
        c + 0.2 * rng.normal(size=(40, D)) for c in centers
    ]).astype(np.float32)
    db = CobwebIndex(corpus_embeddings=base, config=TreeConfig(dim=D),
                     n_subtrees=4)
    db.blocked_threshold = 64          # force the flat-index regime
    db.stale_pending_limit = 32        # shrink the tiers for test speed
    db.delta_rebuild_min = 128
    db._flat_pred_index()              # pin the flat route (see above test)
    db.predict_fast(base[0], k=3, is_embedding=True)
    flat_before = db._flat_cache
    assert flat_before is not None

    sid0 = len(base)
    new = (centers[2] + 0.2 * rng.normal(size=(60, D))).astype(np.float32)
    db.add_sentences([None] * 20, new[:20])     # tier 0
    assert len(db._pending_sids) == 20 and db._delta_n == 0
    db.add_sentences([None] * 20, new[20:40])   # overflow -> consolidate
    assert db._delta_n == 40 and not db._pending_sids
    assert db._flat_cache is flat_before, "NO rebuild on overflow"
    db.add_sentences([None] * 20, new[40:60])   # tier 0 again on top
    assert db._delta_n == 40 and len(db._pending_sids) == 20

    # every unindexed row is retrievable at top-1 (exact closed-form keys
    # in both tiers), old rows still serve from the stale index
    for probe, want in ((0, sid0), (25, sid0 + 25), (45, sid0 + 45)):
        got = db.predict_fast(new[probe], k=3, is_embedding=True,
                              return_ids=True)
        assert got[0] == want, (probe, got)
    got_old = db.predict_fast(base[7], k=5, is_embedding=True,
                              return_ids=True)
    assert 7 in got_old, got_old
    ids = np.asarray(db.query_ids(new[:8], k=1))
    assert ids[:, 0].tolist() == list(range(sid0, sid0 + 8))
    assert db._flat_cache is flat_before, "serving stays rebuild-free"

    # pushing past the rebuild threshold finally invalidates (deferred
    # maintenance, not a per-add cliff)
    big = (centers[5] + 0.2 * rng.normal(size=(80, D))).astype(np.float32)
    db.add_sentences([None] * 80, big)
    assert db._unindexed_count() == 0 and db._flat_cache is None
    # explicit rerank: below rerank_threshold the auto path-score ranking
    # ties same-cluster rows
    got = db.predict_fast(big[0], k=3, is_embedding=True, return_ids=True,
                          rerank=256)
    assert got[0] == sid0 + 60, got


def _whitener_fixture(rng, n=160, d_raw=48):
    """Anisotropic clustered corpus + a fitted PCA+ICA whitener whose
    output dim is SMALLER than the raw dim (exercises the raw-vs-tree
    space split the wrapper owns)."""
    from rag_cobweb_tpu.whitening import PCAICAWhiteningModel
    centers = rng.normal(scale=4.0, size=(8, d_raw))
    scale = np.exp(rng.normal(scale=1.0, size=d_raw))  # anisotropic
    embs = np.concatenate([
        c + 0.3 * scale * rng.normal(size=(n // 8, d_raw)) for c in centers
    ]).astype(np.float32)
    wh = PCAICAWhiteningModel.fit(embs, pca_dim=0.9, ica_max_iter=200)
    return embs, wh


def test_whitener_owned_wrapper_matches_raw_exact():
    """With ``whitener=`` attached the wrapper owns the transform: RAW
    embeddings in, tree + pool in whitened space, exact re-rank in RAW
    space — so with a covering pool the final ranking equals exact RAW
    search (reference splits this across BaseBenchmark + the wrapper;
    base_benchmark.py:100-127)."""
    rng = np.random.default_rng(3)
    embs, wh = _whitener_fixture(rng)
    assert np.asarray(wh.transform(embs[:1])).shape[-1] < embs.shape[1]
    db = CobwebIndex([f"s{i}" for i in range(len(embs))], embs,
                     whitener=wh)
    assert db.cfg.dim == np.asarray(wh.transform(embs[:1])).shape[-1]

    # raw-space exact reference ranking (L2)
    q = embs[:6] + 0.05 * rng.normal(size=(6, embs.shape[1])
                                     ).astype(np.float32)
    d2 = ((q[:, None, :] - embs[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :5]

    got = np.asarray(db.query_ids(q, k=5, rerank=len(embs)))
    assert (got == want).all(), (got[:2], want[:2])

    # predict_fast surface takes RAW embeddings too
    out = db.predict_fast(q[0], k=3, is_embedding=True, return_ids=True)
    assert out[0] == want[0, 0]


def test_whitener_stale_add_then_query_exact():
    """Pending rows in whitener mode key by the RAW-space closed form —
    the same key the exact re-rank produces — so stale merges stay exact
    and fresh rows win their own queries at top-1."""
    rng = np.random.default_rng(4)
    embs, wh = _whitener_fixture(rng)
    db = CobwebIndex(corpus_embeddings=embs, whitener=wh)
    db.blocked_threshold = 32          # force the indexed regime
    db._flat_pred_index()
    db.predict_fast(embs[0], k=3, is_embedding=True)

    fresh = embs[:8] + np.float32(40.0)
    db.add_sentences([None] * 8, fresh)
    assert db._unindexed_count() == 8
    ids = np.asarray(db.query_ids(fresh[:4], k=1))
    assert ids[:, 0].tolist() == [len(embs) + i for i in range(4)]
    # old rows still serve from the stale index
    got = np.asarray(db.query_ids(embs[9:10], k=3))
    assert 9 in got[0]


def test_whitener_no_store_disables_stale_serving():
    """Without the vector store the pending closed form (RAW space) is
    not comparable to the leaf-lp fallback (tree space): the wrapper must
    rebuild instead of stale-serving."""
    rng = np.random.default_rng(5)
    embs, wh = _whitener_fixture(rng)
    db = CobwebIndex(corpus_embeddings=embs, whitener=wh)
    db.store_embeddings = False
    db._vec_chunks = []
    db.blocked_threshold = 32
    db._flat_pred_index()
    db.add_sentences([None] * 4, embs[:4] + np.float32(30.0))
    assert db._unindexed_count() == 0, "must rebuild, not stale-serve"


def test_whitener_npz_round_trip(tmp_path):
    """save()/load() round-trips the attached whitener (pickled into the
    npz extras) for both single-tree and forest wrappers; loaded wrappers
    keep accepting RAW queries."""
    rng = np.random.default_rng(6)
    embs, wh = _whitener_fixture(rng)
    for n_sub in (1, 4):
        db = CobwebIndex([f"s{i}" for i in range(len(embs))], embs,
                         whitener=wh, n_subtrees=n_sub)
        want = np.asarray(db.query_ids(embs[:4], k=3, rerank=64))
        p = str(tmp_path / f"wh{n_sub}.npz")
        db.save(p)
        db2 = CobwebIndex.load(p)
        assert db2.whitener is not None
        got = np.asarray(db2.query_ids(embs[:4], k=3, rerank=64))
        assert (got == want).all()


def test_chunked_rerank_matches_unchunked():
    """A tiny ``rerank_gather_budget`` forces the exact re-rank's query
    batch to chunk (power-of-two chunks + zero-padded tail); results must
    be bit-identical to the unchunked gather.  Regression for the (B, C,
    D) candidate-gather budget path in ``CobwebIndex._rerank_step``."""
    rng = np.random.default_rng(7)
    embs, wh = _whitener_fixture(rng)
    db = CobwebIndex([f"s{i}" for i in range(len(embs))], embs,
                     whitener=wh)
    # 13 queries: non-power-of-two so the padded-tail branch executes
    q = embs[:13] + 0.05 * rng.normal(size=(13, embs.shape[1])
                                      ).astype(np.float32)
    want = np.asarray(db.query_ids(q, k=5, rerank=64))
    db.rerank_gather_budget = 64 * embs.shape[1] * 4 * 4  # bmax -> 4
    got = np.asarray(db.query_ids(q, k=5, rerank=64))
    assert (got == want).all()
