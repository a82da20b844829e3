from .metrics import (
    confusion_hist,
    hist_stats,
    compute_score,
    batch_intersection_union,
    SegMetrics,
)
