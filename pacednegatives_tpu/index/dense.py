"""Dense retrieval index: embeddings in HBM, MIPS top-k, difficulty pools.

The performance north star (BASELINE.json): replace offline PISA BM25 pool
building with an on-device index answering top-k dot-product queries, feeding
the paced sampler with difficulty-ordered pools each step, refreshed by
re-encoding the corpus with the current model.

Sharding: embeddings split over the mesh ``data`` axis (each chip scores its
shard; per-shard top-k candidates are all-gathered over ICI and merged — the
k*n_shards candidate merge is tiny next to the N-dim scoring).

Pool convention matches data/triples.py: EASIEST FIRST. Top-k returns
hardest-first (highest score = most query-similar = hardest negative,
reference compute_all_bm25.py:43-44 reverses exactly like this), so pools
are the reversed top-k.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pacednegatives_tpu.ops.mips import (
    mips_topk_approx,
    mips_topk_exact,
    mips_topk_pallas,
)
from pacednegatives_tpu.parallel.mesh import DATA_AXIS


def _topk(method: str, queries, docs, k, **kw):
    if method == "pallas":
        return mips_topk_pallas(queries, docs, k, **kw)
    if method == "exact":
        return mips_topk_exact(queries, docs, k)
    if method == "approx":
        return mips_topk_approx(queries, docs, k, **kw)
    raise ValueError(method)


@dataclasses.dataclass
class DenseIndex:
    """embeddings: (N, D) fp32/bf16 device array; when ``mesh`` is given the
    array is sharded (N over data axis) and queries are scored shard-local
    with an ICI merge. With ``quantize=True`` the index stores int8 values +
    per-row scales (4x less HBM; dequantization fused into the Pallas score
    kernel, or applied on the fly for the XLA paths)."""

    embeddings: jax.Array
    method: str = "exact"  # "pallas" | "exact" | "approx"
    mesh: Mesh | None = None
    method_kwargs: dict = dataclasses.field(default_factory=dict)
    scales: jax.Array | None = None  # set when quantized (embeddings int8)

    @property
    def num_docs(self) -> int:
        return self.embeddings.shape[0]

    @property
    def quantized(self) -> bool:
        return self.scales is not None

    @classmethod
    def build(
        cls,
        embeddings: jax.Array,
        method: str = "exact",
        mesh: Mesh | None = None,
        quantize: bool = False,
        **method_kwargs,
    ) -> "DenseIndex":
        scales = None
        if quantize:
            from pacednegatives_tpu.ops.mips import quantize_embeddings

            embeddings, scales = quantize_embeddings(embeddings)
        if mesh is not None:
            embeddings = jax.device_put(
                embeddings, NamedSharding(mesh, P(DATA_AXIS, None))
            )
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(mesh, P(DATA_AXIS)))
        return cls(embeddings, method, mesh, method_kwargs, scales)

    def _docs_fp(self) -> jax.Array:
        if not self.quantized:
            return self.embeddings
        return self.embeddings.astype(jnp.float32) * self.scales[:, None]

    # -- queries --------------------------------------------------------------

    def topk(self, queries: jax.Array, k: int):
        """(B, D) queries -> (scores (B,k), doc indices (B,k)), desc order."""
        if self.mesh is not None:
            return self._topk_sharded(queries, k)
        if self.quantized and self.method == "pallas":
            from pacednegatives_tpu.ops.mips import mips_topk_pallas_quantized

            return mips_topk_pallas_quantized(
                queries, self.embeddings, self.scales, k, **self.method_kwargs
            )
        if self.quantized and self.method == "exact":
            # streaming dequantize: O(block) fp32 transient instead of a
            # full-index copy (the scale trap — see ops/mips.py docstring)
            from pacednegatives_tpu.ops.mips import (
                mips_topk_quantized_streaming,
            )

            return mips_topk_quantized_streaming(
                queries, self.embeddings, self.scales, k
            )
        return _topk(
            self.method, queries, self._docs_fp(), k, **self.method_kwargs
        )

    def _topk_sharded(self, queries: jax.Array, k: int):
        method, kw = self.method, self.method_kwargs
        n_shards = self.mesh.shape[DATA_AXIS]
        shard_n = self.num_docs // n_shards
        # a shard can contribute at most shard_n candidates; the merge still
        # yields a valid global top-k for any k <= num_docs
        k_local = min(k, shard_n)
        quantized = self.quantized

        def local(q, docs, scales=None):
            docs = docs[0] if docs.ndim == 3 else docs
            if quantized:
                if method == "pallas":
                    from pacednegatives_tpu.ops.mips import (
                        mips_topk_pallas_quantized,
                    )

                    v, i = mips_topk_pallas_quantized(
                        q, docs, scales, k_local, **kw
                    )
                elif method == "exact":
                    # streaming shard-local dequantize: O(slab) transient
                    # (a full shard copy is ~2.3 GB at 8.8M docs / 8 shards)
                    from pacednegatives_tpu.ops.mips import (
                        mips_topk_quantized_streaming,
                    )

                    v, i = mips_topk_quantized_streaming(
                        q, docs, scales, k_local
                    )
                else:
                    # approx path materializes (B, shard_n) scores anyway;
                    # the shard-local fp32 copy is the lesser term there
                    v, i = _topk(
                        method, q,
                        docs.astype(jnp.float32) * scales[:, None],
                        k_local, **kw,
                    )
            else:
                v, i = _topk(method, q, docs, k_local, **kw)
            i = i + jax.lax.axis_index(DATA_AXIS) * shard_n
            # gather all shards' candidates: (n_shards, B, k_local)
            vs = jax.lax.all_gather(v, DATA_AXIS)
            is_ = jax.lax.all_gather(i, DATA_AXIS)
            B = q.shape[0]
            vs = jnp.moveaxis(vs, 0, 1).reshape(B, n_shards * k_local)
            is_ = jnp.moveaxis(is_, 0, 1).reshape(B, n_shards * k_local)
            mv, pos = jax.lax.top_k(vs, k)
            return mv, jnp.take_along_axis(is_, pos, axis=1)

        if quantized:
            return jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS)),
                out_specs=(P(), P()),
                check_vma=False,
            )(queries, self.embeddings, self.scales)
        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=(P(), P()),
            # outputs are replicated by the all_gather+merge; the static VMA
            # checker can't always prove it
            check_vma=False,
        )(queries, self.embeddings)

    def mine_pools(self, queries: jax.Array, pool_size: int):
        """(B, D) queries -> (B, pool_size) doc indices ordered EASIEST
        FIRST (reversed top-k — parity with compute_all_bm25.py:44)."""
        _, idx = self.topk(queries, pool_size)
        return idx[:, ::-1]

    # -- refresh ----------------------------------------------------------------

    def refreshed(self, new_embeddings: jax.Array) -> "DenseIndex":
        """Double-buffer friendly: returns a new index, old one stays valid
        until dropped. A quantized index is re-quantized (stale per-row
        scales against new embeddings would corrupt every score)."""
        scales = None
        if self.quantized:
            from pacednegatives_tpu.ops.mips import quantize_embeddings

            new_embeddings, scales = quantize_embeddings(new_embeddings)
        if self.mesh is not None:
            new_embeddings = jax.device_put(
                new_embeddings, NamedSharding(self.mesh, P(DATA_AXIS, None))
            )
            if scales is not None:
                scales = jax.device_put(
                    scales, NamedSharding(self.mesh, P(DATA_AXIS))
                )
        return dataclasses.replace(
            self, embeddings=new_embeddings, scales=scales
        )
