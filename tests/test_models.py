"""Derived-network construction and forward-shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasterseg_tpu.models import create_derived, student_plan, teacher_plan


@pytest.fixture(scope="module")
def splan():
    return student_plan()


@pytest.fixture(scope="module")
def tplan():
    return teacher_plan()


def test_student_plan_geometry(splan):
    assert splan.lasts == (2, 1)
    assert splan.heads8_in == 128
    assert splan.ch_16 == 64 and splan.ch_8_2 == 32 and splan.ch_8_1 == 32


def test_student_forward_shapes(splan):
    model, variables = create_derived(splan, jax.random.PRNGKey(0),
                                      input_hw=(64, 128))
    x = jnp.zeros((2, 64, 128, 3))
    (p8, p16, p32), _ = model.apply(variables, x, train=True,
                                    mutable=["batch_stats"])
    assert p8.shape == (2, 64, 128, 19)
    assert p16.shape == (2, 64, 128, 19)
    assert p32.shape == (2, 64, 128, 19)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 128, 19)


def test_teacher_forward_shapes(tplan):
    model, variables = create_derived(tplan, jax.random.PRNGKey(0),
                                      input_hw=(64, 128))
    x = jnp.zeros((1, 64, 128, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 128, 19)


def test_param_count_student(splan):
    """Student should be small (~MB scale). Sanity bound, not exact parity
    (aux heads are train-only in the reference count)."""
    model, variables = create_derived(splan, jax.random.PRNGKey(0),
                                      input_hw=(64, 128))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 1e5 < n < 1e7, n
