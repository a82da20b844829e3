from .gumbel import gumbel_softmax, sample_gumbel, sample_ratios
from .architect import (
    make_arch_optimizer,
    latency_terms,
    LatencyWeightController,
)
from .loop import SearchEngine, run_search
