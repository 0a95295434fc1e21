from wavthruvec_pytorch_tpu.data.prior import (  # noqa: F401
    beta_binomial_prior_distribution,
    get_attention_prior,
)
