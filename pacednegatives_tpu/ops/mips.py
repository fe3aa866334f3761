"""Tiled Pallas MIPS (maximum inner product search) top-k kernel.

Replaces the reference's external PISA/Terrier retrieval (SURVEY.md §2.7)
with on-device dense retrieval: document embeddings stream HBM -> VMEM block
by block, scores hit the MXU, and only per-block top-k' candidates are ever
written back — the full (B, N) score matrix never exists in HBM. A cheap XLA
``lax.top_k`` merges the (num_blocks * k') candidates.

Mosaic has no sort/top_k primitive (checked empirically), so the per-block
top-k' runs k' rounds of max + first-argmax masking on the VPU — O(k' * B *
block_n) vector work against O(B * block_n * D) MXU work, negligible for
k' << D.

Exactness: global top-k is exact iff no doc block contains more than k' of
the true global top-k. With k' = k it is always exact; with k' < k it is
near-exact for non-adversarial score distributions (and the default for the
mining use case, where the consumer is a difficulty-percentile *sampler*).

Alternative paths in index/dense.py: plain XLA einsum + lax.top_k (exact)
and einsum + lax.approx_max_k (TPU-native approximate top-k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.inf


def _block_topk_rounds(scores: jax.Array, base: jax.Array, k_per_block: int):
    """k' rounds of max + first-argmax masking over (B, block_n) scores.

    Mosaic has no sort/top_k primitive and no dynamic lane-indexed stores,
    so round j inserts into loop-carried (B, k') registers via a masked
    select on the lane iota. Returns (values (B, k'), global indices)."""
    B, block_n = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (B, k_per_block), 1)
    init_v = jnp.full((B, k_per_block), NEG_INF, jnp.float32)
    init_i = jnp.zeros((B, k_per_block), jnp.int32)

    def round_fn(j, carry):
        scores, out_v, out_i = carry
        m = jnp.max(scores, axis=1, keepdims=True)  # (B, 1)
        is_max = scores == m
        # first index achieving the max
        amax = jnp.min(jnp.where(is_max, col, block_n), axis=1, keepdims=True)
        out_v = jnp.where(col_k == j, m, out_v)
        out_i = jnp.where(col_k == j, amax + base, out_i)
        scores = jnp.where(col == amax, NEG_INF, scores)
        return scores, out_v, out_i

    _, out_v, out_i = jax.lax.fori_loop(
        0, k_per_block, round_fn, (scores, init_v, init_i)
    )
    return out_v, out_i


def _merge_candidates(cand_v, cand_i, k):
    """(num_blocks, B, k') per-block candidates -> global (B, k) top-k."""
    num_blocks, B, kpb = cand_v.shape
    cand_v = jnp.moveaxis(cand_v, 0, 1).reshape(B, num_blocks * kpb)
    cand_i = jnp.moveaxis(cand_i, 0, 1).reshape(B, num_blocks * kpb)
    v, merged_pos = jax.lax.top_k(cand_v, k)
    return v, jnp.take_along_axis(cand_i, merged_pos, axis=1)


def _mips_block_kernel(q_ref, d_ref, out_v_ref, out_i_ref, *, k_per_block: int):
    """One (doc-block) grid step: scores = q @ block.T, then per-block
    top-k' extraction."""
    scores = jax.lax.dot_general(
        q_ref[:],
        d_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, block_n)
    base = pl.program_id(0) * d_ref.shape[0]
    out_v_ref[0], out_i_ref[0] = _block_topk_rounds(scores, base, k_per_block)


def mips_topk_pallas(
    queries: jax.Array,  # (B, D)
    docs: jax.Array,  # (N, D)
    k: int,
    block_n: int = 1024,
    k_per_block: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k inner products of each query against all docs.

    Returns (scores (B, k), indices (B, k)), sorted descending. N must be a
    multiple of block_n (pad docs with zero rows if needed — zero vectors
    only win when fewer than k real docs exist).
    """
    B, D = queries.shape
    N = docs.shape[0]
    if N % block_n:
        raise ValueError(f"N={N} not a multiple of block_n={block_n}")
    num_blocks = N // block_n
    if k_per_block is None:
        k_per_block = min(k, block_n)
    # the merge needs num_blocks * k' >= k candidates
    k_per_block = max(k_per_block, -(-k // num_blocks))
    k_per_block = min(k_per_block, block_n)

    kernel = functools.partial(_mips_block_kernel, k_per_block=k_per_block)
    cand_v, cand_i = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        # 3-D outputs (num_blocks, B, k') with full-dim trailing blocks —
        # Mosaic requires last-two block dims be 8/128-aligned OR equal to
        # the full array dims; (B, k') equals the full dims here.
        out_specs=(
            pl.BlockSpec((1, B, k_per_block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, k_per_block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks, B, k_per_block), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, B, k_per_block), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * docs.dtype.itemsize + B * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(docs.dtype), docs)

    return _merge_candidates(cand_v, cand_i, k)


def quantize_embeddings(emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: (N, D) fp -> (values int8,
    scales fp32 (N,)). Quarters the index's HBM footprint (the north-star
    "equal index memory" lever: 4x more corpus per chip)."""
    absmax = jnp.max(jnp.abs(emb.astype(jnp.float32)), axis=1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(emb.astype(jnp.float32) / scale[:, None]), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_block_kernel(q_ref, d_ref, s_ref, out_v_ref, out_i_ref, *, k_per_block):
    """Quantized variant: int8 doc block + per-row scales, dequant fused
    into the score matmul (docs cast int8->bf16 in VMEM, never in HBM)."""
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16),
        d_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * s_ref[:].astype(jnp.float32)[None, :]
    base = pl.program_id(0) * d_ref.shape[0]
    out_v_ref[0], out_i_ref[0] = _block_topk_rounds(scores, base, k_per_block)


def mips_topk_pallas_quantized(
    queries: jax.Array,  # (B, D) fp
    d_values: jax.Array,  # (N, D) int8
    d_scales: jax.Array,  # (N,) fp32
    k: int,
    block_n: int = 1024,
    k_per_block: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over an int8-quantized index, dequantization fused in VMEM."""
    B, D = queries.shape
    N = d_values.shape[0]
    if N % block_n:
        raise ValueError(f"N={N} not a multiple of block_n={block_n}")
    num_blocks = N // block_n
    if k_per_block is None:
        k_per_block = min(k, block_n)
    # the merge needs num_blocks * k' >= k candidates
    k_per_block = max(k_per_block, -(-k // num_blocks))
    k_per_block = min(k_per_block, block_n)

    kernel = functools.partial(_quant_block_kernel, k_per_block=k_per_block)
    cand_v, cand_i = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, k_per_block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, k_per_block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks, B, k_per_block), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, B, k_per_block), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D + N * 4 + B * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.float32), d_values, d_scales)

    return _merge_candidates(cand_v, cand_i, k)


def mips_topk_quantized_streaming(
    queries: jax.Array,  # (B, D) fp
    d_values: jax.Array,  # (N, D) int8
    d_scales: jax.Array,  # (N,) fp32
    k: int,
    block_rows: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over an int8 index WITHOUT materializing the fp32 index.

    The memory-safe fallback for row counts the Pallas kernel's block
    alignment doesn't divide (and for non-TPU backends): a ``lax.scan``
    dequantizes and scores one ``block_rows`` slab per iteration, so the
    fp32 transient is O(block_rows * D) — ~134 MB at the defaults with
    D=512 — instead of the full index (~18 GB at 8.8M docs x 512, a hard
    OOM on one chip, which is what the old full-dequantize fallback
    staged). Exact: every block contributes its true top-min(k, block)
    candidates and the merge is a global top-k, so no distribution
    assumption is needed (unlike the k' < k Pallas path).
    """
    B, D = queries.shape
    N = d_values.shape[0]
    q = queries.astype(jnp.float32)
    bs = min(block_rows, N)
    nb = N // bs
    main = nb * bs
    kb = min(k, bs)

    def body(carry, inp):
        v, s, off = inp
        docs = v.astype(jnp.float32) * s[:, None]  # one slab, freed per iter
        sc = jax.lax.dot_general(
            q, docs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, bs)
        bv, bi = jax.lax.top_k(sc, kb)
        return carry, (bv, bi + off)

    offs = jnp.arange(nb, dtype=jnp.int32) * bs
    _, (cv, ci) = jax.lax.scan(
        body, 0,
        (d_values[:main].reshape(nb, bs, D),
         d_scales[:main].reshape(nb, bs), offs),
    )
    cand_v = [jnp.moveaxis(cv, 0, 1).reshape(B, nb * kb)]
    cand_i = [jnp.moveaxis(ci, 0, 1).reshape(B, nb * kb)]
    if main < N:  # ragged tail: one direct (small) slab
        tail = d_values[main:].astype(jnp.float32) * d_scales[main:][:, None]
        sc = jax.lax.dot_general(
            q, tail,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tv, ti = jax.lax.top_k(sc, min(k, N - main))
        cand_v.append(tv)
        cand_i.append(ti + main)
    v, pos = jax.lax.top_k(jnp.concatenate(cand_v, axis=1), k)
    return v, jnp.take_along_axis(jnp.concatenate(cand_i, axis=1), pos, axis=1)


def mips_topk_exact(queries, docs, k):
    """XLA reference path: full einsum + exact top_k."""
    scores = jnp.einsum(
        "bd,nd->bn", queries, docs, preferred_element_type=jnp.float32
    )
    return jax.lax.top_k(scores, k)


def mips_topk_approx(queries, docs, k, recall_target: float = 0.95):
    """XLA approximate path (TPU-native aggregation, lax.approx_max_k)."""
    scores = jnp.einsum(
        "bd,nd->bn", queries, docs, preferred_element_type=jnp.float32
    )
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
