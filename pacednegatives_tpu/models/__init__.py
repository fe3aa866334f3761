from pacednegatives_tpu.models.t5 import (
    T5Config,
    init_params,
    encode,
    decode,
    forward_logits,
)
from pacednegatives_tpu.models.monot5 import (
    VERBALIZER_TRUE,
    VERBALIZER_FALSE,
    score_batch,
    relevance_log_probs,
)

__all__ = [
    "T5Config",
    "init_params",
    "encode",
    "decode",
    "forward_logits",
    "VERBALIZER_TRUE",
    "VERBALIZER_FALSE",
    "score_batch",
    "relevance_log_probs",
]
