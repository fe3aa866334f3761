"""Data layer tests: tokenizers, triples loading, host/device assembly parity."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TrainedTokenizer,
    TripletStore,
    load_triples,
)


@pytest.fixture(scope="module")
def corpus():
    return TextCorpus.synthetic(num_docs=64, num_queries=8, seed=0)


@pytest.fixture(scope="module")
def tok():
    return HashTokenizer(vocab_size=512)


@pytest.fixture(scope="module")
def store(corpus, tok):
    return TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=32)


@pytest.fixture(scope="module")
def triples(corpus):
    return TripletStore.synthetic(corpus, n_pairs=16, n_neg=10, seed=1)


def test_hash_tokenizer_deterministic_and_verbalizers(tok):
    a = tok.encode("hello world Relevant:")
    b = tok.encode("hello world Relevant:")
    assert a == b
    assert tok.encode("true") == [tok.true_id]
    assert tok.encode("false") == [tok.false_id]
    assert tok.encode("x", add_eos=True)[-1] == tok.eos_id


def test_trained_tokenizer_roundtrip(tmp_path, corpus):
    t = TrainedTokenizer.train(corpus.doc_texts + corpus.query_texts, vocab_size=300)
    ids = t.encode(corpus.doc_texts[0])
    assert len(ids) > 0 and max(ids) < t.vocab_size
    assert t.true_id != t.false_id
    # verbalizers are dedicated single special tokens
    assert t._tok.id_to_token(t.true_id) == "<true>"
    assert t._tok.id_to_token(t.false_id) == "<false>"
    p = str(tmp_path / "tok.json")
    t.save(p)
    t2 = TrainedTokenizer.load(p)
    assert t2.encode(corpus.doc_texts[0]) == ids
    assert (t2.true_id, t2.false_id) == (t.true_id, t.false_id)


def test_load_triples_both_json_layouts(tmp_path, corpus, triples):
    jsonl = str(tmp_path / "t.jsonl")
    triples.save_jsonl(jsonl, corpus)
    recs = load_triples(jsonl)
    assert len(recs) == 16 and len(recs[0]["doc_id_b"]) == 10

    # records-array layout (pandas to_json orient='records')
    arr = str(tmp_path / "t.json")
    with open(arr, "w") as f:
        json.dump(recs, f)
    recs2 = load_triples(arr)
    assert recs2 == recs


def test_triplet_store_roundtrip_and_order(tmp_path, corpus, triples):
    jsonl = str(tmp_path / "t.jsonl")
    triples.save_jsonl(jsonl, corpus)
    recs = load_triples(jsonl)
    st = TripletStore.from_records(recs, corpus)
    np.testing.assert_array_equal(st.pools, triples.pools)
    # hard_first flips the pool
    st_flip = TripletStore.from_records(recs, corpus, order="hard_first")
    np.testing.assert_array_equal(st_flip.pools, triples.pools[:, ::-1])


def test_ragged_pool_normalization(corpus):
    recs = [
        {"query_id": "q0", "doc_id_a": "d0", "doc_id_b": ["d1", "d2", "d3", "d4", "d5", "d6"]},
        {"query_id": "q1", "doc_id_a": "d1", "doc_id_b": ["d7", "d8", "d9"]},
    ]
    st = TripletStore.from_records(recs, corpus, n_neg=3)
    assert st.pools.shape == (2, 3)
    # balanced subsample keeps endpoints
    assert st.pools[0, 0] == corpus.doc_index["d1"]
    assert st.pools[0, -1] == corpus.doc_index["d6"]


def test_prompt_assembly_matches_direct_tokenization(corpus, tok, store):
    """With the hash tokenizer (word = token) and no truncation, segment
    assembly equals tokenizing the full prompt string, minus padding."""
    q_row, d_row = 2, 5
    ids, mask = store.assemble_host(np.array([q_row]), np.array([d_row]))
    got = ids[0][mask[0] == 1].tolist()
    want = tok.encode(
        f"Query: {corpus.query_texts[q_row]} Document: {corpus.doc_texts[d_row]} Relevant:",
        add_eos=True,
    )
    assert got == want


def test_device_assembly_matches_host(corpus, tok, store, triples):
    dc = DeviceCorpus.build(store, triples)
    q = np.array([0, 3, 5], np.int32)
    d = np.array([10, 2, 63], np.int32)
    h_ids, h_mask = store.assemble_host(q, d)
    d_ids, d_mask = jax.jit(dc.assemble)(jnp.asarray(q), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(d_ids), h_ids)
    np.testing.assert_array_equal(np.asarray(d_mask), h_mask)


def test_pair_batch_selects_by_difficulty(store, triples):
    dc = DeviceCorpus.build(store, triples)
    pair_idx = jnp.arange(4)
    b0 = jax.jit(lambda i: dc.pair_batch(i, jnp.float32(0.0)))(pair_idx)
    b1 = jax.jit(lambda i: dc.pair_batch(i, jnp.float32(1.0)))(pair_idx)
    # difficulty 0 -> pool slot 0; difficulty 1 -> last slot
    d0 = triples.pools[:4, 0]
    d1 = triples.pools[:4, -1]
    exp0, _ = store.assemble_host(triples.query_rows[:4], d0)
    exp1, _ = store.assemble_host(triples.query_rows[:4], d1)
    np.testing.assert_array_equal(np.asarray(b0["neg_ids"]), exp0)
    np.testing.assert_array_equal(np.asarray(b1["neg_ids"]), exp1)
    # labels
    assert np.all(np.asarray(b0["pos_labels"])[:, 0] == store.true_id)
    assert np.all(np.asarray(b0["neg_labels"])[:, 0] == store.false_id)


def test_lce_batch_shapes_and_pool_membership(store, triples):
    dc = DeviceCorpus.build(store, triples)
    pair_idx = jnp.arange(3)
    batch = jax.jit(
        lambda k, i: dc.lce_batch(k, i, jnp.float32(0.5), n=4)
    )(jax.random.key(0), pair_idx)
    L = store.prompt_len
    assert batch["pos_ids"].shape == (3, L)
    assert batch["neg_ids"].shape == (12, L)
    assert batch["neg_labels"].shape == (12, 2)
    # each negative prompt's doc tokens must come from that pair's pool
    neg_ids = np.asarray(batch["neg_ids"]).reshape(3, 4, L)
    t = store.template
    d_start = len(t.prefix) + store.q_tokens.shape[1] + len(t.mid)
    d_end = d_start + store.d_tokens.shape[1]
    for b in range(3):
        pool_docs = {tuple(store.d_tokens[r]) for r in triples.pools[b]}
        for j in range(4):
            assert tuple(neg_ids[b, j, d_start:d_end]) in pool_docs


def test_encode_all_chunked_matches_unchunked(corpus, tok):
    """TokenizedStore.build fills preallocated matrices chunk-by-chunk
    (data/pipeline._encode_all); the chunk size must not affect output,
    including when it straddles the corpus length or is 1."""
    base = TokenizedStore.build(corpus, tok, max_q_tokens=8, max_d_tokens=32)
    for chunk in (1, 7, 64, 1000):
        st = TokenizedStore.build(
            corpus, tok, max_q_tokens=8, max_d_tokens=32, chunk=chunk
        )
        np.testing.assert_array_equal(st.d_tokens, base.d_tokens)
        np.testing.assert_array_equal(st.d_mask, base.d_mask)
        np.testing.assert_array_equal(st.q_tokens, base.q_tokens)


def test_encode_batch_matches_encode(corpus):
    """TrainedTokenizer.encode_batch (the multi-core Rust path) must agree
    with per-call encode on every text."""
    tok = TrainedTokenizer.train(corpus.doc_texts, vocab_size=300)
    texts = corpus.doc_texts[:20] + corpus.query_texts[:5]
    assert tok.encode_batch(texts) == [tok.encode(t) for t in texts]


def test_sentencepiece_export_roundtrip(tmp_path, corpus):
    """spm_export writes a standard sentencepiece Unigram ModelProto
    (SURVEY §2.7 tokenizer-artifact parity). Validated two ways: an
    independent protobuf parser (protoc --decode_raw, run during
    development) confirmed the wire layout; here the in-repo reader
    round-trips every piece/score/type and the trainer id fields."""
    from pacednegatives_tpu.data.spm_export import (
        CONTROL,
        UNKNOWN,
        USER_DEFINED,
        read_model,
    )

    tok = TrainedTokenizer.train(corpus.doc_texts, vocab_size=300)
    path = str(tmp_path / "spiece.model")
    tok.save_sentencepiece(path)

    m = read_model(path)
    assert m["trainer"]["model_type"] == 1  # UNIGRAM
    assert m["trainer"]["vocab_size"] == len(m["pieces"]) == tok.vocab_size
    assert m["trainer"]["pad_id"] == tok.pad_id
    assert m["trainer"]["eos_id"] == tok.eos_id
    assert m["trainer"]["bos_id"] == -1  # T5 convention: no BOS
    assert m["trainer"]["unk_id"] == m["pieces"].index(
        ("<unk>", 0.0, UNKNOWN)
    )
    # piece order preserves tokenizer ids; types follow T5 conventions
    import json as _json

    vocab = _json.loads(tok._tok.to_str())["model"]["vocab"]
    assert [p for p, _, _ in m["pieces"]] == [p for p, _ in vocab]
    byname = {p: t for p, _, t in m["pieces"]}
    assert byname["<pad>"] == CONTROL and byname["</s>"] == CONTROL
    assert byname["<true>"] == USER_DEFINED and byname["<false>"] == USER_DEFINED
    # scores survive the float32 round trip
    for (p, s, _), (p2, s2) in zip(m["pieces"], vocab):
        assert abs(s - s2) < 1e-6 * max(1.0, abs(s2))
