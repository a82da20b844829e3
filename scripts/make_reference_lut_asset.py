"""Convert the reference's GPU-measured latency LUT into a JSON test asset.

One-shot asset generator (like make_parity_assets.py): reads
/root/reference/latency/latency_lookup_table.npy (667 TensorRT-measured
entries, latency/latency_lookup_table.py:7-113) and writes
tests/assets/reference_lut.json so the golden latency-walk test
(tests/test_latency.py) runs without the reference checkout.
"""

import json
import os

import numpy as np

SRC = "/root/reference/latency/latency_lookup_table.npy"
DST = os.path.join(os.path.dirname(__file__), "..", "tests", "assets",
                   "reference_lut.json")

table = {k: float(v) for k, v in
         np.load(SRC, allow_pickle=True).item().items()}
with open(os.path.abspath(DST), "w") as f:
    json.dump(table, f, indent=0, sort_keys=True)
print(f"wrote {len(table)} entries -> {DST}")
