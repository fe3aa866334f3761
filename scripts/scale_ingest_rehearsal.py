"""MS MARCO-scale REAL-TEXT ingestion rehearsal (VERDICT r2 item 8).

The 1M/8.8M-doc online-mining numbers in BENCH/ROADMAP use synthetic TOKEN
matrices; the text->tokens path at that scale (host RAM, tokenizer
throughput, TSV streaming) was untested. This script streams a synthetic
SCALE_DOCS-doc TSV with MS MARCO-passage-like statistics (mean ~55 words/
passage; collection.tsv is ``id<TAB>text``, reference train/train_lce.py's
ir_datasets docs iterator) through the REAL ingestion path:

    TextCorpus.from_tsv -> TrainedTokenizer -> TokenizedStore.build
        -> TripletStore -> DeviceCorpus.build  (device put skipped on CPU)

and reports wall time + RSS per stage as JSON lines, so at corpus-mount
time the only untested input is the text itself.

Usage:
    SCALE_DOCS=1000000 python scripts/scale_ingest_rehearsal.py
Knobs: SCALE_DOCS (default 1M), SCALE_QUERIES (default 10k),
SCALE_DEVICE=1 to device_put the corpus (needs a chip with enough HBM),
SCALE_KEEP=1 to keep the generated TSVs, SCALE_STREAMING=0 to exercise the
legacy in-RAM path (default is the bounded-RSS streaming builder,
data/streaming.py — round-4 answer to the ~24 GB extrapolation at 8.8M).
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def emit(stage: str, t0: float, **extra) -> None:
    rec = {"stage": stage, "seconds": round(time.monotonic() - t0, 2),
           "peak_rss_gb": round(rss_gb(), 2), **extra}
    print(json.dumps(rec), flush=True)


def write_tsvs(docs_path: str, queries_path: str, n_docs: int, n_queries: int):
    """Stream-write MS MARCO-shaped TSVs without holding them in RAM."""
    rng = np.random.default_rng(0)
    vocab = np.array(
        [f"w{i}" for i in range(30000)]
        + [f"term{i}ing" for i in range(10000)]
        + [f"x{i}q" for i in range(10000)]
    )
    t0 = time.monotonic()
    with open(docs_path, "w") as f:
        for d in range(n_docs):
            ln = 40 + int(rng.integers(0, 30))  # ~55 words mean
            words = vocab[rng.integers(0, len(vocab), size=ln)]
            f.write(f"{d}\t{' '.join(words)}\n")
    with open(queries_path, "w") as f:
        for q in range(n_queries):
            words = vocab[rng.integers(0, len(vocab), size=6)]
            f.write(f"{q}\t{' '.join(words)}\n")
    emit("write_tsv", t0, docs=n_docs, queries=n_queries,
         tsv_gb=round(os.path.getsize(docs_path) / 1e9, 2))


def main():
    n_docs = int(os.environ.get("SCALE_DOCS", "1000000"))
    n_queries = int(os.environ.get("SCALE_QUERIES", "10000"))
    outdir = os.environ.get("SCALE_DIR", "/tmp/scale_ingest")
    os.makedirs(outdir, exist_ok=True)
    docs_path = os.path.join(outdir, "collection.tsv")
    queries_path = os.path.join(outdir, "queries.tsv")

    from pacednegatives_tpu.data import (
        DeviceCorpus,
        TextCorpus,
        TokenizedStore,
        TripletStore,
        build_streaming_store,
    )
    from pacednegatives_tpu.data.streaming import iter_tsv_texts
    from pacednegatives_tpu.data.tokenizer import TrainedTokenizer

    write_tsvs(docs_path, queries_path, n_docs, n_queries)
    streaming = os.environ.get("SCALE_STREAMING", "1") == "1"

    if streaming:
        # Streaming path (data/streaming.py): O(chunk) host RAM — the TSV is
        # never materialized as Python lists and the token matrices live on
        # disk (int16 memmap, pad-derived masks).
        t0 = time.monotonic()
        sample = [
            t for i, t in enumerate(iter_tsv_texts(docs_path))
            if i % max(1, n_docs // 100000) == 0
        ]
        tok = TrainedTokenizer.train(sample, vocab_size=32128)
        emit("train_tokenizer", t0, sample_docs=len(sample))

        t0 = time.monotonic()
        store = build_streaming_store(
            docs_path, queries_path, tok, max_q_tokens=32, max_d_tokens=180,
            workdir=outdir,
        )
        dt = time.monotonic() - t0
        emit("tokenized_store_streaming", t0, docs_per_sec=int(n_docs / dt),
             d_tokens_gb=round(store.d_tokens.nbytes / 1e9, 2))
    else:
        t0 = time.monotonic()
        corpus = TextCorpus.from_tsv(docs_path, queries_path)
        emit("from_tsv", t0, docs=corpus.num_docs)

        # Train the tokenizer on a corpus SAMPLE (the production recipe —
        # training on all 8.8M docs is pointless for a unigram vocab).
        t0 = time.monotonic()
        sample = corpus.doc_texts[:: max(1, n_docs // 100000)]
        tok = TrainedTokenizer.train(sample, vocab_size=32128)
        emit("train_tokenizer", t0, sample_docs=len(sample))

        t0 = time.monotonic()
        store = TokenizedStore.build(corpus, tok, max_q_tokens=32,
                                     max_d_tokens=180)
        dt = time.monotonic() - t0
        emit("tokenized_store", t0, docs_per_sec=int(n_docs / dt),
             d_tokens_gb=round(store.d_tokens.nbytes / 1e9, 2))

    t0 = time.monotonic()
    rng = np.random.default_rng(1)
    n_pairs = min(100000, n_queries * 10)
    triples = TripletStore(
        query_rows=rng.integers(0, n_queries, n_pairs).astype(np.int32),
        pos_rows=rng.integers(0, n_docs, n_pairs).astype(np.int32),
        pools=rng.integers(0, n_docs, (n_pairs, 16)).astype(np.int32),
    )
    emit("triples", t0, pairs=n_pairs)

    t0 = time.monotonic()
    if os.environ.get("SCALE_DEVICE", "0") == "1":
        dc = DeviceCorpus.build(store, triples)
        emit("device_corpus", t0, device=True)
        del dc
    else:
        # CPU rehearsal: exercise the same validation + dtype-compaction
        # host work without requiring chip HBM for the full corpus.
        import jax

        jax.config.update("jax_platforms", "cpu")
        dc = DeviceCorpus.build(store, triples)
        emit("device_corpus", t0, device=False)
        del dc

    if os.environ.get("SCALE_KEEP", "0") != "1":
        os.remove(docs_path)
        os.remove(queries_path)


if __name__ == "__main__":
    main()
