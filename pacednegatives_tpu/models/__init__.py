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
from pacednegatives_tpu.models.quant import (
    quantize_scoring_params,
    score_batch_int8,
)

__all__ = [
    "quantize_scoring_params",
    "score_batch_int8",
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
