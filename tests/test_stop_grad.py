"""Freeze-boundary stop-gradient: identical updates, skipped frozen backward.

The reference freezes everything below layer4 (layer3 joins at epochs//3 —
submodel_trainer.py:609-633,687-691). Our train step zeroes frozen grads with
a mask; stop_grad_stage additionally stops the backward pass AT the boundary
so XLA never emits the frozen stages' backward. These tests pin the contract:
the optimizer-visible result is the same either way, in both phases, and BN
running stats below the boundary still update (torch .train() semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
from synthetic_audio_detection_tpu.train import steps
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)

INPUT = 64


def _make(stop_grad_stage: int, unfreeze: bool = False):
    model = BinaryClassifier()
    cfg = TrainConfig(batch_size=2, lr=1e-3)
    state, tx = steps.create_train_state(
        model, jax.random.PRNGKey(0), cfg, input_size=INPUT
    )
    if unfreeze:
        state = steps.unfreeze_layer3(state)
    step = steps.make_train_step(
        model, tx, cfg, SpectrogramConfig(out_size=INPUT),
        SpecAugmentConfig(), from_waveforms=False,
        stop_grad_stage=stop_grad_stage,
    )
    return state, jax.jit(step)


def _batch():
    rng = np.random.default_rng(3)
    return {
        "image": jnp.asarray(
            rng.standard_normal((4, INPUT, INPUT, 3)).astype(np.float32)
        ),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "weight": jnp.ones((4,), jnp.float32),
    }


@pytest.mark.parametrize("unfreeze,stage", [(False, 4), (True, 3)])
def test_stop_grad_updates_match_masked_path(unfreeze, stage):
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    state_a, step_a = _make(0, unfreeze)  # masked-only (reference behavior)
    state_b, step_b = _make(stage, unfreeze)  # + stop-grad boundary

    new_a, m_a = step_a(state_a, batch, rng)
    new_b, m_b = step_b(state_b, batch, rng)

    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)

    flat_a = jax.tree_util.tree_leaves_with_path(new_a.params)
    flat_b = jax.tree_util.tree_leaves_with_path(new_b.params)
    assert len(flat_a) == len(flat_b)
    for (path_a, leaf_a), (path_b, leaf_b) in zip(flat_a, flat_b):
        assert path_a == path_b
        np.testing.assert_allclose(
            np.asarray(leaf_a, np.float64), np.asarray(leaf_b, np.float64),
            rtol=1e-5, atol=1e-7,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path_a)}",
        )

    # BN running stats update identically everywhere (forward-side effect,
    # unaffected by the gradient stop) — including BELOW the boundary
    stats_a = jax.tree_util.tree_leaves(new_a.batch_stats)
    stats_b = jax.tree_util.tree_leaves(new_b.batch_stats)
    for sa, sb in zip(stats_a, stats_b):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-6, atol=1e-8)


def test_frozen_stages_bn_stats_still_update_under_stop_grad():
    batch = _batch()
    state, step = _make(4)
    before = np.asarray(state.batch_stats["base"]["bn1"]["mean"])
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = np.asarray(new_state.batch_stats["base"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_frozen_params_unchanged_under_stop_grad():
    batch = _batch()
    state, step = _make(4)
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    # layer1 (frozen in phase 1) must be bit-identical
    old_l1 = jax.tree_util.tree_leaves(state.params["base"]["layer1_0"])
    new_l1 = jax.tree_util.tree_leaves(new_state.params["base"]["layer1_0"])
    for o, n in zip(old_l1, new_l1):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(n))
    # head + layer4 (trainable) must have moved
    old_h = np.asarray(
        jax.tree_util.tree_leaves(state.params["head"])[0])
    new_h = np.asarray(
        jax.tree_util.tree_leaves(new_state.params["head"])[0])
    assert not np.allclose(old_h, new_h)
