"""Full-network numeric parity against the reference implementation.

Assets (tests/assets/parity_*.npz) hold a seeded-random-weight reference
Network_Multi_Path_Infer state_dict plus its eval-mode forward output on a
fixed input (see scripts/make_parity_assets.py). We import the weights and
require elementwise agreement of the whole network — stem, merged-branch
cells, zoomed convs, BiSeNet aggregation, FFM, head, x8 upsample.
"""

import os

import jax
import numpy as np
import pytest

from fasterseg_tpu.models import DerivedNet, student_plan, teacher_plan
from fasterseg_tpu.utils.torch_import import import_derived_state_dict


@pytest.mark.parametrize("name,planner", [
    ("student", student_plan),
    ("teacher", teacher_plan),
])
def test_forward_matches_reference(assets_dir, name, planner):
    data = np.load(os.path.join(assets_dir, f"parity_{name}.npz"))
    sd = {k[len("state/"):]: data[k] for k in data.files
          if k.startswith("state/")}
    plan = planner()
    variables = import_derived_state_dict(sd, plan)

    model = DerivedNet(plan=plan)
    # structure check: imported tree must slot into the init structure
    init_vars = model.init(jax.random.PRNGKey(0), data["input"], train=True)
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    want_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init_vars["params"])}
    assert got_paths == want_paths, (
        f"missing: {sorted(want_paths - got_paths)[:5]} "
        f"extra: {sorted(got_paths - want_paths)[:5]}")

    out = model.apply(variables, data["input"], train=False)
    np.testing.assert_allclose(np.asarray(out), data["output"],
                               rtol=2e-4, atol=2e-4)
