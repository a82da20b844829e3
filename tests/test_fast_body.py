"""Fully-planar fast body (models/fast_body.py) parity vs the flax
DerivedNet, elementwise (Pallas interpreter on CPU).

Coverage: the shipped student plan (ops 2/3/4, stride-2 conv_2x/zoomed,
lasts=(2,1)), the shipped teacher plan (zoomed stride-1, lasts=(2,1),
width 1.0), and a synthetic plan exercising the remaining primitives —
skip at stride 1 and 2 (FactorizedReduce), conv (op1) at both strides,
conv_2x down — and the lasts=(2,0)-style last==0 passthrough branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.core.genotype import Genotype, path_to_downs
from fasterseg_tpu.core.plan import build_plan
from fasterseg_tpu.models import (InferenceRunner, create_derived,
                                  student_plan, teacher_plan)
from fasterseg_tpu.models.fast_body import fast_body
from fasterseg_tpu.models.infer import fast_stem


def _geno(ops, path):
    return Genotype(ops=tuple(ops), path=tuple(path),
                    downs=tuple(path_to_downs(path)),
                    widths=tuple([1.0] * (len(path) - 1)))


def _synthetic_plan():
    """lasts=(2,1): branch0 hits skip-down (op0 s2) twice and conv (op1);
    branch1 hits skip-identity (op0 s1) and conv_2x down (op3 s2)."""
    g2 = _geno((1, 0, 0, 1), (0, 0, 1, 2))
    g1 = _geno((0, 3, 1), (0, 0, 1))
    return build_plan({2: g2, 1: g1}, [2, 1], Fch=8, num_classes=7,
                      stem_head_width=(1.0, 1.0))


def _passthrough_plan():
    """lasts=(1,0): covers the last==0 aggregation passthrough and a
    zoomed stride-2 (op4 down) + zoomed stride-1 (op2) mix."""
    g1 = _geno((4, 2, 1), (0, 1, 1))
    g0 = _geno((2, 1, 1), (0, 0, 0))
    return build_plan({1: g1, 0: g0}, [1, 0], Fch=8, num_classes=5,
                      stem_head_width=(1.0, 1.0))


def _init_with_stats(plan, hw, rng):
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=hw, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, hw[0], hw[1], 3))
                    .astype(np.float32))
    # one train step gives the running stats non-trivial values
    _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
    return model, {"params": variables["params"], **upd}, x


@pytest.mark.parametrize("plan_fn,hw", [
    (student_plan, (64, 128)),
    pytest.param(teacher_plan, (64, 128), marks=pytest.mark.slow),
    (_synthetic_plan, (64, 128)),
    pytest.param(_passthrough_plan, (64, 128), marks=pytest.mark.slow),
])
def test_fast_body_matches_derived(rng, plan_fn, hw):
    plan = plan_fn()
    model, variables, x = _init_with_stats(plan, hw, rng)
    ref = np.asarray(model.apply(variables, x, train=False, upsample=False))
    stem = fast_stem(variables["params"]["stem"],
                     variables["batch_stats"]["stem"], x,
                     dtype=jnp.float32, planar_out=True)
    got = np.asarray(fast_body(plan, variables["params"],
                               variables["batch_stats"], stem,
                               dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_runner_fast_body_logits_parity(rng):
    """InferenceRunner fast-body logits == flax-path logits end-to-end
    (including the x8 upsample contract)."""
    plan = student_plan()
    model, variables, x = _init_with_stats(plan, (64, 128), rng)
    fast = InferenceRunner(plan, variables, dtype=jnp.float32,
                           fast_body_enabled=True)
    slow = InferenceRunner(plan, variables, dtype=jnp.float32,
                           fast_stem_enabled=False)
    np.testing.assert_allclose(np.asarray(fast.logits(variables, x)),
                               np.asarray(slow.logits(variables, x)),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(fast.classmap(variables, x)),
                                  np.asarray(slow.classmap(variables, x)))
