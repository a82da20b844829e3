from .lut import (
    LatencyLUT,
    op_key,
    convnorm_key,
    ffm_key,
    head_key,
    parse_key,
)
from .cost_model import TpuCostModel, calibrate
from .measure import time_jitted, measure_apply_ms, slope_time_ms
from .tables import build_supernet_tables, stem_latency_ms
from .estimator import expected_latency_ms, cell_ratio_wiring
from .derived import derived_latency_ms, fps_of
