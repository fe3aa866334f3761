from pacednegatives_tpu.ops.losses import (
    token_ce,
    pairwise_ce_loss,
    lce_ce,
    eta_weight,
    self_paced_objective,
    margin_mse,
)
from pacednegatives_tpu.ops.sampling import (
    binomial_log_pmf,
    paced_binomial_log_probs,
    paced_binomial_probs,
    sample_pool_indices,
    difficulty_to_index,
)

__all__ = [
    "token_ce",
    "pairwise_ce_loss",
    "lce_ce",
    "eta_weight",
    "self_paced_objective",
    "margin_mse",
    "binomial_log_pmf",
    "paced_binomial_log_probs",
    "paced_binomial_probs",
    "sample_pool_indices",
    "difficulty_to_index",
]
