"""Fast-tier trace check for every model family's TRAIN path.

Round-3 shipped a trace-time ``TypeError`` (``rcnn.py`` passing
``train=`` to an hbb ``RPNHead`` that didn't accept it) that only the
slow golden-loss tier could catch. This test abstractly traces the full
train step (loss + grads + optimizer update) for every family via
``jax.eval_shape`` — no XLA compile, seconds not minutes — so signature
and shape breaks in any train path fail the fast gate.

Reference analogue: the per-project regression tests
(``projects/*/test_*.py``) all exercise one optimizer step.
"""

import jax
import pytest

from tests import test_golden_loss as G


@pytest.mark.parametrize("name", sorted(G._BUILDERS))
def test_train_step_traces(name):
    step, state, images, targets = G._BUILDERS[name]()
    out = jax.eval_shape(step, state, images, targets,
                         jax.random.PRNGKey(3))
    new_state, metrics = out
    assert "total_loss" in metrics
    assert metrics["total_loss"].shape == ()
