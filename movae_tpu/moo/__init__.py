"""Multi-objective gradient aggregation engine (Jacobian descent on TPU)."""

from movae_tpu.moo.aggregators import (  # noqa: F401
    AGGREGATOR_NAMES,
    AggregatorConfig,
    comfort_beta,
    compute_weights,
    gradient_similarity,
    init_state,
)
from movae_tpu.moo.engine import (  # noqa: F401
    FeatureJacobian,
    combine,
    full_jacobian,
    gramian,
)
