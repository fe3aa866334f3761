from pacednegatives_tpu.eval.metrics import (
    average_precision,
    ndcg_at_k,
    reciprocal_rank,
    recall_at_k,
    precision_at_k,
    evaluate_run,
)
from pacednegatives_tpu.eval.experiment import experiment
from pacednegatives_tpu.eval.rerank import Reranker
from pacednegatives_tpu.eval.run_io import read_trec_run, write_trec_run

__all__ = [
    "average_precision",
    "ndcg_at_k",
    "reciprocal_rank",
    "recall_at_k",
    "precision_at_k",
    "evaluate_run",
    "experiment",
    "Reranker",
    "read_trec_run",
    "write_trec_run",
]
