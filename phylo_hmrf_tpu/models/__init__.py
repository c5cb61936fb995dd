from phylo_hmrf_tpu.models.ou import (
    split_params, ou_moments, ou_moments_batch, ou_nll_stats, ou_nll_init,
)
from phylo_hmrf_tpu.models.emission import gaussian_logpdf

__all__ = [
    "split_params", "ou_moments", "ou_moments_batch", "ou_nll_stats",
    "ou_nll_init", "gaussian_logpdf",
]
