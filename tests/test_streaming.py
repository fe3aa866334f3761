"""Streaming ingestion (data/streaming.py): bounded-RAM tokenize-to-memmap.

Pins (a) elementwise equivalence with the in-RAM TokenizedStore.build path
— tokens AND the pad-derived masks — across chunk boundaries and a
non-divisible tail, (b) assemble_host parity between a mask-less streaming
store and a standard store, (c) DeviceCorpus built from the streaming
store trains/gathers identically (int16 memmap device-put path), and
(d) the pad-id-as-content-token guard.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pacednegatives_tpu.data import (
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
    build_streaming_store,
    stream_tokenize,
)
from pacednegatives_tpu.data.streaming import iter_tsv_texts


def _corpus(n_docs=37, n_queries=9):
    # 37 docs + chunk=8 exercises several chunk flushes plus a ragged tail
    return TextCorpus.synthetic(num_docs=n_docs, num_queries=n_queries,
                                seed=3)


def _write_tsvs(corpus, tmp_path):
    d = os.path.join(tmp_path, "docs.tsv")
    q = os.path.join(tmp_path, "queries.tsv")
    with open(d, "w") as f:
        for i, t in zip(corpus.doc_ids, corpus.doc_texts):
            f.write(f"{i}\t{t}\n")
    with open(q, "w") as f:
        for i, t in zip(corpus.query_ids, corpus.query_texts):
            f.write(f"{i}\t{t}\n")
    return d, q


def test_streaming_matches_in_ram_build(tmp_path):
    corpus = _corpus()
    tok = HashTokenizer(vocab_size=256)
    ram = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    d_tsv, q_tsv = _write_tsvs(corpus, str(tmp_path))
    stream = build_streaming_store(
        d_tsv, q_tsv, tok, max_q_tokens=6, max_d_tokens=16,
        workdir=str(tmp_path), chunk=8,
    )
    assert stream.d_tokens.dtype == np.int16  # vocab 256 fits
    assert isinstance(stream.d_tokens, np.memmap)
    np.testing.assert_array_equal(
        np.asarray(stream.d_tokens, np.int32), ram.d_tokens
    )
    np.testing.assert_array_equal(
        np.asarray(stream.q_tokens, np.int32), ram.q_tokens
    )
    # pad-derived masks == the in-RAM builder's explicit masks
    np.testing.assert_array_equal(
        (np.asarray(stream.d_tokens) != tok.pad_id).astype(np.int32),
        ram.d_mask,
    )
    assert stream.prompt_len == ram.prompt_len


def test_assemble_host_parity_maskless(tmp_path):
    corpus = _corpus()
    tok = HashTokenizer(vocab_size=256)
    ram = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    stream = build_streaming_store(
        corpus.doc_texts, corpus.query_texts, tok,
        max_q_tokens=6, max_d_tokens=16, workdir=str(tmp_path), chunk=8,
    )
    q = np.array([0, 3, 5], np.int32)
    d = np.array([1, 17, 30], np.int32)
    ids_r, mask_r = ram.assemble_host(q, d)
    ids_s, mask_s = stream.assemble_host(q, d)
    np.testing.assert_array_equal(ids_s, ids_r)
    np.testing.assert_array_equal(mask_s, mask_r)


def test_device_corpus_from_streaming_store(tmp_path):
    corpus = _corpus()
    tok = HashTokenizer(vocab_size=256)
    stream = build_streaming_store(
        corpus.doc_texts, corpus.query_texts, tok,
        max_q_tokens=6, max_d_tokens=16, workdir=str(tmp_path), chunk=8,
    )
    ram = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
    triples = TripletStore.synthetic(corpus, n_pairs=6, n_neg=4, seed=1)
    dc_s = DeviceCorpus.build(stream, triples)
    dc_r = DeviceCorpus.build(ram, triples)
    assert dc_s.d_tokens.dtype == jnp.int16
    idx = jnp.arange(4, dtype=jnp.int32)
    ids_s, mask_s = dc_s.assemble(dc_s.query_rows[idx], dc_s.pos_rows[idx])
    ids_r, mask_r = dc_r.assemble(dc_r.query_rows[idx], dc_r.pos_rows[idx])
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids_r))
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_r))
    # store_masks=True is a loud error on a mask-less store
    with pytest.raises(ValueError):
        DeviceCorpus.build(stream, triples, store_masks=True)


def test_tsv_iterator_and_gz(tmp_path):
    corpus = _corpus(n_docs=5)
    d_tsv, _ = _write_tsvs(corpus, str(tmp_path))
    assert list(iter_tsv_texts(d_tsv)) == corpus.doc_texts
    import gzip
    import shutil

    gz = d_tsv + ".gz"
    with open(d_tsv, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    assert list(iter_tsv_texts(gz)) == corpus.doc_texts


def test_pad_id_content_guard(tmp_path):
    class EvilTok:
        vocab_size = 256
        pad_id = 0
        true_id = 3
        false_id = 4
        eos_id = 1

        def encode(self, text, add_eos=False):
            return [0, 5, 6]  # emits pad_id as content

    out = os.path.join(str(tmp_path), "bad.bin")
    with pytest.raises(ValueError, match="pad_id"):
        stream_tokenize(["some text"], EvilTok(), 8, out)
