"""pacednegatives_tpu — a TPU-native self-paced negative-mining IR training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Parry-Parry/PacedNegatives (monoT5 cross-encoder reranker training on MS MARCO
with difficulty-paced negative sampling), redesigned TPU-first:

- ``models``     — from-scratch T5 encoder-decoder (pure-functional JAX pytrees)
- ``ops``        — losses, paced samplers, Pallas kernels
- ``parallel``   — device mesh, sharding rules, collectives
- ``curriculum`` — pacing controllers as pure jittable state machines
- ``data``       — corpus/triples stores, tokenizers, device-resident pipelines
- ``train``      — fused jitted train steps, loop, checkpointing, metrics
- ``index``      — dense retrieval index sharded over HBM + MIPS top-k
- ``eval``       — MRR/nDCG/MAP metrics, rerank runner, paired experiments
- ``distill``    — MarginMSE distillation with lexical teacher ensembles
"""

__version__ = "0.1.0"
