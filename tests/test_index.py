"""MIPS kernel parity and dense-index tests (Pallas in interpret mode on CPU;
compiled path exercised on TPU by bench/verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pacednegatives_tpu.index import DenseIndex
from pacednegatives_tpu.models.dual_encoder import embed, encode_corpus
from pacednegatives_tpu.ops.mips import (
    mips_topk_approx,
    mips_topk_exact,
    mips_topk_pallas,
)
from pacednegatives_tpu.parallel import MeshConfig, create_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    docs = rng.normal(size=(2048, 64)).astype(np.float32)
    queries = rng.normal(size=(8, 64)).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(docs)


def test_pallas_kernel_exact_when_k_per_block_eq_k(data):
    q, d = data
    k = 16
    v, i = mips_topk_pallas(q, d, k, block_n=256, k_per_block=k, interpret=True)
    rv, ri = mips_topk_exact(q, d, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_pallas_kernel_near_exact_small_k_per_block(data):
    q, d = data
    k = 32
    v, i = mips_topk_pallas(q, d, k, block_n=256, k_per_block=8, interpret=True)
    rv, _ = mips_topk_exact(q, d, k)
    # recall of true top-k values
    recall = np.mean(
        [
            len(set(np.asarray(v)[b].round(4)) & set(np.asarray(rv)[b].round(4))) / k
            for b in range(q.shape[0])
        ]
    )
    assert recall > 0.9


def test_pallas_rejects_non_multiple_block(data):
    q, d = data
    with pytest.raises(ValueError):
        mips_topk_pallas(q, d, 8, block_n=1000)


def test_approx_path_runs(data):
    q, d = data
    v, i = mips_topk_approx(q, d, 16)
    assert v.shape == (8, 16) and i.shape == (8, 16)


def test_dense_index_single_device(data):
    q, d = data
    idx = DenseIndex.build(d, method="exact")
    v, i = idx.topk(q, 10)
    s = np.asarray(q) @ np.asarray(d).T
    want = np.argsort(-s, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(i), want)
    # descending scores
    assert np.all(np.diff(np.asarray(v), axis=1) <= 1e-6)


def test_dense_index_sharded_matches_single(data):
    q, d = data
    mesh = create_mesh(MeshConfig(data=8, model=1))
    sharded = DenseIndex.build(d, method="exact", mesh=mesh)
    v_s, i_s = jax.jit(lambda qq: sharded.topk(qq, 10))(q)
    single = DenseIndex.build(d, method="exact")
    v, i = single.topk(q, 10)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i))


def test_mine_pools_easiest_first(data):
    q, d = data
    idx = DenseIndex.build(d, method="exact")
    pools = idx.mine_pools(q, 20)
    v, top = idx.topk(q, 20)
    np.testing.assert_array_equal(np.asarray(pools), np.asarray(top)[:, ::-1])
    # pool[-1] is the highest-scoring (hardest) candidate
    s = np.asarray(q) @ np.asarray(d).T
    hardest = s.argmax(axis=1)
    np.testing.assert_array_equal(np.asarray(pools)[:, -1], hardest)


def test_embed_and_encode_corpus():
    from pacednegatives_tpu.models import T5Config, init_params

    cfg = T5Config.tiny(vocab_size=128)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    tokens = rng.integers(2, 128, size=(10, 12)).astype(np.int32)
    mask = np.ones_like(tokens)
    mask[:, 9:] = 0

    e = embed(params, cfg, jnp.asarray(tokens), jnp.asarray(mask))
    assert e.shape == (10, cfg.d_model)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e), axis=1), 1.0, rtol=1e-5
    )

    # batched scan path matches direct, incl. the padded tail
    e2 = encode_corpus(params, cfg, jnp.asarray(tokens), jnp.asarray(mask), batch_size=4)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), rtol=2e-5, atol=2e-6)


def test_quantization_roundtrip_and_recall(data):
    from pacednegatives_tpu.ops.mips import quantize_embeddings

    q, d = data
    vals, scales = quantize_embeddings(d)
    assert vals.dtype == jnp.int8 and scales.shape == (2048,)
    deq = np.asarray(vals, np.float32) * np.asarray(scales)[:, None]
    rel_err = np.abs(deq - np.asarray(d)).max() / np.abs(np.asarray(d)).max()
    assert rel_err < 0.01  # int8 per-row absmax: <1% of row max

    exact = DenseIndex.build(d, method="exact")
    quant = DenseIndex.build(d, method="exact", quantize=True)
    _, ie = exact.topk(q, 20)
    _, iq = quant.topk(q, 20)
    recall = np.mean([
        len(set(np.asarray(ie)[b]) & set(np.asarray(iq)[b])) / 20
        for b in range(q.shape[0])
    ])
    assert recall > 0.9


def test_quantized_pallas_kernel_matches_dequant_exact(data):
    from pacednegatives_tpu.ops.mips import (
        mips_topk_pallas_quantized,
        quantize_embeddings,
    )

    q, d = data
    vals, scales = quantize_embeddings(d)
    v, i = mips_topk_pallas_quantized(
        q, vals, scales, 16, block_n=256, k_per_block=16, interpret=True
    )
    deq = jnp.asarray(np.asarray(vals, np.float32) * np.asarray(scales)[:, None])
    # bf16 matmul in-kernel vs fp32 reference: compare against bf16-cast ref
    ref_scores = np.asarray(
        jnp.einsum("bd,nd->bn", q.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    )
    rv = np.sort(ref_scores, axis=1)[:, ::-1][:, :16]
    np.testing.assert_allclose(np.asarray(v), rv, rtol=2e-2, atol=1e-2)


def test_quantized_sharded_index(data):
    q, d = data
    mesh = create_mesh(MeshConfig(data=8, model=1))
    quant = DenseIndex.build(d, method="exact", mesh=mesh, quantize=True)
    v, i = jax.jit(lambda qq: quant.topk(qq, 10))(q)
    plain = DenseIndex.build(d, method="exact", quantize=True)
    v2, i2 = plain.topk(q, 10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_refreshed_returns_new_index(data):
    q, d = data
    idx = DenseIndex.build(d, method="exact")
    d2 = jnp.asarray(np.roll(np.asarray(d), 1, axis=0))
    idx2 = idx.refreshed(d2)
    assert idx2 is not idx
    v1, i1 = idx.topk(q, 5)
    v2, i2 = idx2.topk(q, 5)
    np.testing.assert_array_equal((np.asarray(i1) + 1) % 2048, np.asarray(i2))


def test_pallas_quantized_single_block_small_kpb():
    """k_per_block below ceil(k / num_blocks) must be raised so the merge
    has enough candidates (regression: 4096-doc corpus + block_n=4096 +
    k=65 + k'=32 crashed lax.top_k)."""
    from pacednegatives_tpu.ops.mips import (
        mips_topk_exact,
        mips_topk_pallas_quantized,
        quantize_embeddings,
    )

    rng = np.random.default_rng(5)
    N, D, B, k = 4096, 64, 4, 65
    docs = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    vals, scales = quantize_embeddings(docs)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v, i = mips_topk_pallas_quantized(
        q, vals, scales, k, block_n=4096, k_per_block=32, interpret=True
    )
    assert v.shape == (B, k) and i.shape == (B, k)
    deq = vals.astype(jnp.float32) * scales[:, None]
    ve, ie = mips_topk_exact(q, deq, k)
    np.testing.assert_array_equal(np.asarray(i[:, 0]), np.asarray(ie[:, 0]))


def test_quantized_streaming_matches_full_dequantize():
    """The memory-safe fallback (ops/mips.mips_topk_quantized_streaming)
    must be EXACTLY the full-dequantize top-k — including a row count that
    is not a multiple of the scan block (ragged tail branch)."""
    from pacednegatives_tpu.ops.mips import (
        mips_topk_exact,
        mips_topk_quantized_streaming,
        quantize_embeddings,
    )

    rng = np.random.default_rng(11)
    N, D, B, k = 1000 + 37, 32, 5, 20  # 1037 % 256 != 0 -> tail branch
    docs = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    vals, scales = quantize_embeddings(docs)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v, i = mips_topk_quantized_streaming(q, vals, scales, k, block_rows=256)
    deq = vals.astype(jnp.float32) * scales[:, None]
    ve, ie = mips_topk_exact(q, deq, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ve), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ie))


def test_quantized_streaming_never_materializes_full_index():
    """The scale trap (VERDICT r4 weak #5), pinned at the REAL shape: at
    the 8.8M-doc MS MARCO design point with a non-block-aligned row count,
    the lowered program must contain the int8 index but NO full-size fp32
    tensor over the corpus rows (the old fallback staged an (N, D) fp32
    dequantize — ~18 GB at D=512, a guaranteed single-chip OOM). lower()
    only traces, so the 8.8M-row shape costs no memory here."""
    from pacednegatives_tpu.ops.mips import mips_topk_quantized_streaming

    N, D, B, k = 8_806_400 + 1000, 64, 4, 129  # not a multiple of 1024
    txt = (
        jax.jit(lambda q, v, s: mips_topk_quantized_streaming(q, v, s, k))
        .lower(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((N, D), jnp.int8),
            jax.ShapeDtypeStruct((N,), jnp.float32),
        )
        .as_text()
    )
    assert f"{N}x{D}xi8" in txt  # the int8 index itself is there...
    assert f"{N}x{D}xf32" not in txt  # ...but never a full fp32 copy


def test_dense_index_quantized_exact_uses_streaming_fallback():
    """DenseIndex(method='exact', quantized) must answer through the
    streaming path — same results as dequantize-then-topk, no full fp32
    index in the lowered program."""
    from pacednegatives_tpu.index.dense import DenseIndex
    from pacednegatives_tpu.ops.mips import (
        mips_topk_exact,
        quantize_embeddings,
    )

    rng = np.random.default_rng(12)
    N, D, B, k = 300, 16, 3, 7
    docs = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    vals, scales = quantize_embeddings(docs)
    idx = DenseIndex(embeddings=vals, scales=scales, method="exact")
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v, i = idx.topk(q, k)
    deq = vals.astype(jnp.float32) * scales[:, None]
    ve, ie = mips_topk_exact(q, deq, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ve), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ie))
