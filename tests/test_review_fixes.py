"""Regression tests for the round-1 code-review findings."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.train.runner import RunConfig, _build_controller, _opt_steps, run


TINY = dict(
    model="tiny", bf16=False, remat=False, vocab_size=512,
    synthetic_docs=32, synthetic_queries=8, synthetic_pairs=32,
    synthetic_pool=8, max_q_tokens=6, max_d_tokens=16,
    batch_size=4, chunk_size=2,
)


def test_schedules_built_in_optimizer_steps():
    """Finding 1: warmup/total were passed in example units; the LR must
    peak at warmup//batch_size optimizer steps and decay to 0 at the end."""
    cfg = RunConfig(total_steps=100_000, warmup_steps=10_000, batch_size=16)
    steps, warmup = _opt_steps(cfg)
    assert steps == 6250 and warmup == 625

    from pacednegatives_tpu.curriculum.eta import linear_warmup_decay

    sched = linear_warmup_decay(1.0, warmup, steps)
    assert abs(float(sched(warmup)) - 1.0) < 1e-6  # peaks at warmup
    assert float(sched(steps)) < 1e-6  # decays to ~0 by the last step


def test_level_bump_uses_pool_len_minus_one():
    """Finding 8: reference n_neg = len(pool) - 1."""
    from pacednegatives_tpu.data import TextCorpus, TripletStore

    corpus = TextCorpus.synthetic(num_docs=32, num_queries=8)
    triples = TripletStore.synthetic(corpus, n_pairs=8, n_neg=10)
    ctrl = _build_controller(
        RunConfig(curriculum="level", batch_size=4), triples
    )
    assert ctrl.n_neg == 9  # pool of 10 -> bump 1/9


def test_meta_run_uses_weights_as_difficulty_and_load_run_is_strict(tmp_path):
    """Findings 2+3: meta runs select negatives by per-example weight, and
    load_run restores the trained table (shape (num_batches, B)) strictly."""
    cfg = RunConfig(
        curriculum="meta-cheap", total_steps=16, warmup_steps=4,
        out_dir=str(tmp_path / "m"), **TINY,
    )
    summary = run(cfg)
    assert summary["steps"] == 4

    from pacednegatives_tpu.train.runner import load_run

    params, mcfg, tok, rc = load_run(cfg.out_dir)  # must not raise
    assert rc.curriculum == "meta-cheap"

    # a missing checkpoint must raise, not silently return fresh params
    with pytest.raises(Exception):
        load_run(cfg.out_dir, checkpoint="nonexistent")


def test_checkpoint_cadence_not_aliased_by_chunks(tmp_path):
    """Finding 4: every_steps not divisible by chunk_size must still fire."""
    cfg = RunConfig(
        curriculum="interp", total_steps=48, warmup_steps=4,
        checkpoint_every_steps=5,  # chunk=2: old modulo logic fires at 10s
        out_dir=str(tmp_path / "c"), **TINY,
    )
    run(cfg)  # 12 steps, chunks of 2 -> ckpts at >= every 5th step boundary
    ckpts = [d for d in os.listdir(cfg.out_dir) if d.startswith("step_")]
    assert len(ckpts) >= 2  # 12/5 -> at least steps 6 and 12


def test_refreshed_quantized_index_requantizes():
    """Finding 7: refresh must not keep stale int8 scales."""
    from pacednegatives_tpu.index import DenseIndex

    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    d2 = jnp.asarray(10.0 * rng.normal(size=(64, 16)).astype(np.float32))
    idx = DenseIndex.build(d1, method="exact", quantize=True)
    idx2 = idx.refreshed(d2)
    assert idx2.quantized and idx2.embeddings.dtype == jnp.int8
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    _, got = idx2.topk(q, 5)
    want = np.argsort(-(np.asarray(q) @ np.asarray(d2).T), axis=1)[:, :5]
    # int8 quantization: top-5 should agree on the vast majority
    agree = np.mean([
        len(set(got[b].tolist()) & set(want[b].tolist())) / 5 for b in range(4)
    ])
    assert agree > 0.8


def test_stream_raises_on_undersized_corpus():
    """Finding 6: hang -> clear error."""
    from pacednegatives_tpu.train.loop import pair_index_stream

    with pytest.raises(ValueError, match="trainable pairs"):
        next(pair_index_stream(num_pairs=4, batch_size=8))


def test_success_rate_metric_not_clobbered(tmp_path):
    """Finding 10: level runs must log the per-batch success rate, plus the
    windowed accumulator under its own key."""
    cfg = RunConfig(
        curriculum="level", total_steps=16, warmup_steps=4,
        heuristic_step_check=2, out_dir=str(tmp_path / "l"), **TINY,
    )
    run(cfg)
    with open(os.path.join(cfg.out_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    keyed = [r for r in recs if "success_rate" in r]
    assert keyed and all("success_rate_window" in r for r in keyed)


def test_dropout_masks_independent():
    """Finding 9: attention vs residual dropout must differ (same key reuse
    made them correlated)."""
    from pacednegatives_tpu.models import T5Config, forward_logits, init_params

    cfg = T5Config.tiny(vocab_size=128)
    import dataclasses

    cfg = dataclasses.replace(cfg, dropout_rate=0.5)
    params = init_params(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 128, (2, 8)), jnp.int32)
    labels = jnp.asarray(np.random.default_rng(1).integers(2, 128, (2, 2)), jnp.int32)
    a = forward_logits(params, cfg, ids, labels, deterministic=False,
                       dropout_key=jax.random.key(7))
    b = forward_logits(params, cfg, ids, labels, deterministic=False,
                       dropout_key=jax.random.key(8))
    assert float(jnp.abs(a - b).max()) > 0  # different keys -> different nets


def test_dph_single_term_doc_no_nan():
    """Review-2 finding 1: DPH NaN when a doc is one repeated term."""
    from pacednegatives_tpu.index.bm25 import MODEL_DPH, LexicalIndex

    ix = LexicalIndex.build(["hello hello", "hello world foo", "bar baz"])
    if not ix.native:
        pytest.skip("native lib unavailable")
    ids, scores = ix.search("hello", k=3, model=MODEL_DPH)
    assert np.all(np.isfinite(scores))
    s = ix.score_pair("hello", 0, model=MODEL_DPH)
    assert np.isfinite(s)


def test_sharded_k_exceeding_shard_size():
    """Review-2 finding 6: k > num_docs // n_shards must work."""
    from pacednegatives_tpu.index import DenseIndex
    from pacednegatives_tpu.parallel import MeshConfig, create_mesh

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))  # 8/shard
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    mesh = create_mesh(MeshConfig(data=8, model=1))
    idx = DenseIndex.build(d, method="exact", mesh=mesh)
    v, i = idx.topk(q, 32)  # > shard_n=8
    single = DenseIndex.build(d, method="exact")
    v2, i2 = single.topk(q, 32)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_quantized_sharded_stays_int8():
    """Review-2 finding 3: sharded quantized top-k must consume the int8
    values + scales (shard-local dequant), and match the unsharded result."""
    from pacednegatives_tpu.index import DenseIndex
    from pacednegatives_tpu.parallel import MeshConfig, create_mesh

    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    mesh = create_mesh(MeshConfig(data=8, model=1))
    sharded = DenseIndex.build(d, method="exact", mesh=mesh, quantize=True)
    assert sharded.embeddings.dtype == jnp.int8
    _, i = sharded.topk(q, 10)
    plain = DenseIndex.build(d, method="exact", quantize=True)
    _, i2 = plain.topk(q, 10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_teacher_channels_numeric_order():
    """Review-2 finding 7: >=10 channels must order numerically."""
    from pacednegatives_tpu.distill import TeacherScores

    scores = {str(i): {"q": {"d": float(i)}} for i in list(range(10)) + [11]}
    ts = TeacherScores(scores)
    v = ts.lookup("q", "d", neg=False)
    np.testing.assert_allclose(v, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11])


def test_sparse_build_merges_duplicate_doc_term_entries():
    """Advisor r2: build() is a public API over arbitrary (term_ids, weights);
    duplicate term ids within one doc must merge (sum), not silently drop
    score mass in search()'s fancy-index accumulation."""
    from pacednegatives_tpu.index.sparse import SparseIndex

    # doc 0 lists term 3 twice with weights 1.0 and 2.0 -> must score as 3.0
    term_ids = np.array([[3, 3], [3, 5]], np.int32)
    weights = np.array([[1.0, 2.0], [1.5, 1.0]], np.float32)
    idx = SparseIndex.build(term_ids, weights, num_terms=8, quantize=False)
    docs, scores = idx.search(np.array([3], np.int32),
                              np.array([1.0], np.float32), k=10)
    np.testing.assert_array_equal(docs, [0, 1])
    np.testing.assert_allclose(scores, [3.0, 1.5])


def test_device_corpus_mask_invariant_raises_not_asserts():
    """Advisor r2: the derived-mask invariant must survive python -O."""
    import dataclasses

    import pytest

    from pacednegatives_tpu.data import (
        DeviceCorpus, HashTokenizer, TextCorpus, TokenizedStore, TripletStore,
    )

    tok = HashTokenizer(vocab_size=512)
    corpus = TextCorpus.synthetic(num_docs=8, num_queries=4, seed=0)
    store = TokenizedStore.build(corpus, tok, max_q_tokens=4, max_d_tokens=8)
    triples = TripletStore.synthetic(corpus, n_pairs=4, n_neg=2, seed=0)
    # corrupt the mask: mark a non-pad token position as padded
    bad_m = store.d_mask.copy()
    assert store.d_tokens[0, -1] != store.pad_id
    bad_m[0, -1] = 0
    store = dataclasses.replace(store, d_mask=bad_m)
    with pytest.raises(ValueError, match="pad_id"):
        DeviceCorpus.build(store, triples)


def test_stale_native_lib_triggers_rebuild(monkeypatch):
    """Advisor r2 (medium): a liblexical.so missing newer symbols must
    trigger a forced rebuild, not an uncaught AttributeError."""
    from pacednegatives_tpu.index import bm25 as bm25mod

    real_bind = bm25mod._bind
    calls = {"n": 0}

    def flaky_bind(lib):
        calls["n"] += 1
        if calls["n"] == 1:  # simulate the stale .so's missing symbol
            raise AttributeError("lex_stem not found")
        return real_bind(lib)

    monkeypatch.setattr(bm25mod, "_bind", flaky_bind)
    lib = bm25mod._load_lib()
    if lib is None:  # no toolchain in env: fallback path, nothing to check
        return
    assert calls["n"] == 2  # rebuilt and re-bound
    assert hasattr(lib, "lex_stem")


def test_genuinely_stale_native_lib_rebuilds_and_binds(tmp_path):
    """A REAL stale .so (compiled without the newer symbols, loaded once so
    dlopen caches its pathname) must still end in a working library: the
    rebuild is loaded through a fresh temp pathname because dlopen caches by
    path and ctypes never dlcloses — re-loading the original path would
    return the stale in-memory image (round-3 review finding)."""
    import shutil
    import subprocess

    from pacednegatives_tpu.index import bm25 as bm25mod

    if shutil.which("g++") is None or shutil.which("make") is None:
        pytest.skip("no native toolchain")

    # build a stale library: defines lex_create but NOT lex_stem etc.
    stale_src = tmp_path / "stale.cpp"
    stale_src.write_text(
        'extern "C" void* lex_create(int) { return nullptr; }\n'
    )
    stale_so = tmp_path / "stale.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(stale_so), str(stale_src)],
        check=True, capture_output=True,
    )

    lib_path = bm25mod._LIB_PATH
    backup = None
    if os.path.exists(lib_path):
        backup = lib_path + ".bak"
        os.replace(lib_path, backup)
    try:
        shutil.copy2(stale_so, lib_path)
        lib = bm25mod._load_lib()
        assert lib is not None, "rebuild-from-stale returned the fallback"
        assert hasattr(lib, "lex_stem")
        # and the bound symbols actually work
        import ctypes

        out = ctypes.create_string_buffer(32)
        assert lib.lex_stem(b"running", out, 32) > 0
    finally:
        if backup:
            os.replace(backup, lib_path)
