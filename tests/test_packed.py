"""Packed (contiguous) prompt assembly + length-bucketed serving.

The reference tokenizes whole prompt strings (lceT5.py:40-53), so its real
tokens are contiguous with pads only at the tail; this framework's static
segment layout instead pads INSIDE the sequence (after the query segment and
after the doc segment). ``packed=True`` reproduces the reference's
positional geometry on both assembly paths (host
``TokenizedStore.assemble_host_packed`` / device ``DeviceCorpus(packed=
True)``) — required for imported pretrained checkpoints — and enables the
length-bucketed serving mode in ``eval.Reranker`` (score each batch at the
smallest bucket length that fits it, instead of the corpus max).
"""

import numpy as np
import pytest

import jax

from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.data.pipeline import pack_rows
from pacednegatives_tpu.eval import Reranker
from pacednegatives_tpu.models import T5Config, init_params


def _varlen_corpus(num_docs=24, num_queries=4, seed=0):
    """Docs with strongly varied word counts (2..28) — the length
    distribution bucketing exists for."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(200)]
    docs = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(2, 28, size=num_docs)
    ]
    queries = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(2, 7, size=num_queries)
    ]
    return TextCorpus(
        [f"d{i}" for i in range(num_docs)],
        docs,
        [f"q{i}" for i in range(num_queries)],
        queries,
    )


@pytest.fixture(scope="module")
def setup():
    corpus = _varlen_corpus()
    tok = HashTokenizer(vocab_size=256)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=32)
    return corpus, tok, store


def test_pack_rows_compacts_preserving_order():
    ids = np.array([[5, 0, 7, 0, 9], [1, 2, 0, 0, 3]], np.int32)
    mask = np.array([[1, 0, 1, 0, 1], [1, 1, 0, 0, 1]], np.int32)
    got_ids, got_mask = pack_rows(ids, mask, pad_id=0)
    np.testing.assert_array_equal(got_ids, [[5, 7, 9, 0, 0], [1, 2, 3, 0, 0]])
    np.testing.assert_array_equal(
        got_mask, [[1, 1, 1, 0, 0], [1, 1, 1, 0, 0]]
    )
    # truncation to a length that fits every row's real tokens is allowed
    got_ids, got_mask = pack_rows(ids, mask, pad_id=0, out_len=3)
    assert got_ids.shape == (2, 3)
    np.testing.assert_array_equal(got_ids, [[5, 7, 9], [1, 2, 3]])


def test_pack_rows_normalizes_tail_to_pad_id():
    # a masked-out position holding a NON-pad token must still come out as
    # pad_id, or downstream token-derived masks would resurrect it
    ids = np.array([[5, 99, 7]], np.int32)
    mask = np.array([[1, 0, 1]], np.int32)
    got_ids, _ = pack_rows(ids, mask, pad_id=0)
    np.testing.assert_array_equal(got_ids, [[5, 7, 0]])


def test_pack_rows_refuses_truncating_real_tokens():
    ids = np.array([[1, 2, 3, 4]], np.int32)
    mask = np.ones((1, 4), np.int32)
    with pytest.raises(ValueError, match="truncate"):
        pack_rows(ids, mask, pad_id=0, out_len=3)


def test_host_packed_matches_naive_contiguous_construction(setup):
    corpus, tok, store = setup
    q_rows = np.arange(4)
    d_rows = np.arange(4, 8)
    ids, mask = store.assemble_host_packed(q_rows, d_rows)
    t = store.template
    for i in range(4):
        q_real = [x for x in store.q_tokens[q_rows[i]] if x != tok.pad_id]
        d_real = [x for x in store.d_tokens[d_rows[i]] if x != tok.pad_id]
        want = list(t.prefix) + q_real + list(t.mid) + d_real + list(t.suffix)
        n = len(want)
        np.testing.assert_array_equal(ids[i, :n], want)
        assert (ids[i, n:] == tok.pad_id).all()
        assert (mask[i, :n] == 1).all() and (mask[i, n:] == 0).all()


def test_pair_lengths_match_masks(setup):
    corpus, tok, store = setup
    q_rows = np.arange(4)
    d_rows = np.arange(8, 12)
    _, mask = store.assemble_host(q_rows, d_rows)
    np.testing.assert_array_equal(
        store.pair_lengths(q_rows, d_rows), mask.sum(axis=1)
    )


def test_device_packed_matches_host_packed(setup):
    corpus, tok, store = setup
    triples = TripletStore.synthetic(corpus, n_pairs=8, n_neg=4, seed=1)
    dc = DeviceCorpus.build(store, triples, packed=True)
    q_rows = np.arange(4)
    d_rows = np.arange(12, 16)
    want_ids, want_mask = store.assemble_host_packed(q_rows, d_rows)
    got_ids, got_mask = dc.assemble(np.asarray(q_rows), np.asarray(d_rows))
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)


def test_packed_lce_batch_masks_are_contiguous(setup):
    corpus, tok, store = setup
    triples = TripletStore.synthetic(corpus, n_pairs=8, n_neg=6, seed=2)
    dc = DeviceCorpus.build(store, triples, packed=True)
    batch = dc.lce_batch(jax.random.key(0), np.arange(4), 0.5, n=3)
    for ids, mask in (
        (batch["pos_ids"], batch["pos_mask"]),
        (batch["neg_ids"], batch["neg_mask"]),
    ):
        m = np.asarray(mask)
        # mask rows are 1...1 0...0 (monotone nonincreasing): no interior pads
        assert (np.diff(m, axis=1) <= 0).all()
        assert (np.asarray(ids)[m == 0] == store.pad_id).all()


def test_packed_score_invariant_to_bucket_length(setup):
    """Trailing pads must not change a packed prompt's score — this is both
    the bucketing correctness condition and a mask-completeness regression
    test for encode/decode."""
    corpus, tok, store = setup
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(0), cfg)
    rr = Reranker(
        params, cfg, store, corpus,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        batch_size=4, packed=True,
    )
    q_rows = np.zeros(4, np.int64)
    d_rows = np.arange(4)
    need = int(store.pair_lengths(q_rows, d_rows).max())
    full = rr._score_block(q_rows, d_rows, None)  # full prompt length
    short = rr._score_block(q_rows, d_rows, need)
    np.testing.assert_allclose(short, full, rtol=1e-5, atol=1e-5)


def test_warm_covers_every_bucket_used(setup):
    """warm() must pre-compile exactly the bucket set score_pairs will
    pick for the same pairs, so serving after warm is compile-free."""
    corpus, tok, store = setup
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(2), cfg)
    rr = Reranker(
        params, cfg, store, corpus,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        batch_size=4, packed=True, bucket_lens=(16, 24, 32, 40),
    )
    rng = np.random.default_rng(5)
    q_rows = rng.integers(0, corpus.num_queries, size=12)
    d_rows = rng.integers(0, corpus.num_docs, size=12)
    compiled = rr.warm(q_rows, d_rows)
    used = {out_len for _, out_len in rr._bucket_plan(q_rows, d_rows)}
    assert used == set(compiled)
    assert np.isfinite(rr.score_pairs(q_rows, d_rows)).all()


def test_int8_reranker_composes_with_packed(setup):
    """int8=True must (a) quantize once at construction, (b) produce the
    same scores as calling models.quant.score_batch_int8 directly, and
    (c) compose with the packed/bucketed path."""
    from pacednegatives_tpu.models.quant import (
        quantize_scoring_params,
        score_batch_int8,
    )

    corpus, tok, store = setup
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(3), cfg)
    rr = Reranker(
        params, cfg, store, corpus,
        rel_id=tok.true_id, nrel_id=tok.false_id,
        batch_size=4, packed=True, bucket_lens=(24, 40), int8=True,
    )
    q_rows = np.zeros(4, np.int64)
    d_rows = np.arange(4)
    got = rr.score_pairs(q_rows, d_rows)
    ((blk, out_len),) = rr._bucket_plan(q_rows, d_rows)
    ids, mask = store.assemble_host_packed(q_rows[blk], d_rows[blk], out_len)
    qp = quantize_scoring_params(params, cfg)
    want = np.asarray(
        score_batch_int8(qp, cfg, ids, mask,
                         rel_id=tok.true_id, nrel_id=tok.false_id)
    )
    # jitted quantization (Reranker) vs eager (here) can flip a weight
    # sitting on an int8 rounding boundary — compare scores loosely and
    # ranks exactly
    np.testing.assert_allclose(got[blk], want, atol=5e-3)
    np.testing.assert_array_equal(np.argsort(got[blk]), np.argsort(want))


def test_bucketed_rerank_matches_unbucketed(setup):
    corpus, tok, store = setup
    cfg = T5Config.tiny(vocab_size=256)
    params = init_params(jax.random.key(1), cfg)
    kw = dict(rel_id=tok.true_id, nrel_id=tok.false_id, batch_size=4)
    flat = Reranker(params, cfg, store, corpus, packed=True, **kw)
    buck = Reranker(
        params, cfg, store, corpus, packed=True,
        bucket_lens=(16, 24, 32, 40), **kw
    )
    M = 16
    rng = np.random.default_rng(3)
    q_rows = rng.integers(0, corpus.num_queries, size=M)
    d_rows = rng.integers(0, corpus.num_docs, size=M)
    a = flat.score_pairs(q_rows, d_rows)
    b = buck.score_pairs(q_rows, d_rows)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
