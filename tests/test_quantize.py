"""int8 PTQ serving path: quantize/dequantize round-trip + classmap
agreement with the bf16 path (the TensorRT-int8 equivalent, SURVEY §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np


def _setup(hw=(64, 128)):
    from fasterseg_tpu.models import create_derived, student_plan
    plan = student_plan()
    model, variables = create_derived(plan, jax.random.PRNGKey(0),
                                      input_hw=hw, dtype=jnp.bfloat16)
    return plan, variables


def test_quantize_roundtrip_and_sizes():
    from fasterseg_tpu.models.quantize import (dequantize_params,
                                               quantize_params)
    plan, variables = _setup()
    qtree, stree = quantize_params(variables["params"])
    q_leaves = jax.tree_util.tree_leaves(qtree)
    n_int8 = sum(1 for l in q_leaves if l.dtype == jnp.int8)
    assert n_int8 > 10  # every conv kernel quantized
    deq = dequantize_params(qtree, stree, jnp.float32)
    for (pa, a), b in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree_util.tree_leaves(deq)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if a.ndim == 4 and a.shape[2] != 3:
            # conv kernel under the MSE-optimal per-channel clip: its
            # reconstruction error can exceed half a raw-absmax step on
            # clipped outliers, but per channel it must be at least as
            # good (in MSE) as the plain absmax/127 quantizer
            step = np.abs(a).max(axis=(0, 1, 2), keepdims=True) / 127.0
            step = np.where(step > 0, step, 1.0)
            plain = (np.clip(np.round(a / step), -127, 127) * step - a)
            mse_plain = (plain ** 2).sum(axis=(0, 1, 2))
            mse_ours = ((b - a) ** 2).sum(axis=(0, 1, 2))
            assert np.all(mse_ours <= mse_plain + 1e-10), pa
        else:  # passthrough leaves (incl. the exempt image-entry conv)
            np.testing.assert_array_equal(a, b)


def test_quantized_classmap_agreement():
    """Weight-only int8 classmap must agree with bf16 on >=99.9% of
    pixels (VERDICT round-2 next-step #3 acceptance)."""
    from fasterseg_tpu.models.infer import InferenceRunner
    from fasterseg_tpu.models.quantize import quantize_variables

    plan, variables = _setup()
    runner = InferenceRunner(plan, variables, dtype=jnp.bfloat16)
    qvars, qrunner = quantize_variables(plan, variables)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 128, 3),
                          jnp.bfloat16)
    cm = np.asarray(runner.classmap(variables, x))
    qcm = np.asarray(qrunner.classmap(qvars, x))
    agree = float((cm == qcm).mean())
    # random-init logits have near-zero argmax margins, so this unit
    # bound is loose; the >=99.9% acceptance runs on the TRAINED
    # miou-study checkpoint (scripts/int8_check.py, README)
    assert agree >= 0.97, agree
    # logits stay close in soft terms too
    lg = np.asarray(runner.logits(variables, x), np.float32)
    qlg = np.asarray(qrunner.logits(qvars, x), np.float32)
    assert np.abs(lg - qlg).mean() < 0.05
