"""Incremental head addition (train/add_head.py): frozen-trunk training,
splice invariants (pre-existing heads bit-identical), metadata round-trip.

Reference counterpart: the CSV re-merge workflow being extended
(model_merger.py:93-160) — which cannot add a class to a shared-trunk
artifact without retraining every head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble import multihead
from synthetic_audio_detection_tpu.train import add_head, joint
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)

SPEC64 = SpectrogramConfig(out_size=64)


@pytest.fixture(scope="module")
def base_trainer():
    cfg = TrainConfig(batch_size=4, lr=1e-3)
    return joint.JointTrainer(
        cfg, synthetic_classes=["SynA", "SynB"], spec_cfg=SPEC64,
        augment=SpecAugmentConfig(enabled=False), use_mesh=False,
        log_dir="/tmp/tb_addhead_test",
    )


@pytest.fixture(scope="module")
def base_ensemble(base_trainer):
    return base_trainer.to_ensemble()


def _rand_head_vars(trunk, seed=9):
    from synthetic_audio_detection_tpu.models.head import BinaryHead
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    base = create_resnet("resnet18", 3, jnp.float32, module_name="base")
    dummy = jnp.zeros((2, 64, 64, 3), jnp.float32)
    feats = base.apply(
        {"params": trunk["params"], "batch_stats": trunk["batch_stats"]},
        dummy, train=False)
    hv = BinaryHead().init({"params": jax.random.PRNGKey(seed)}, feats,
                           train=False)
    return hv["params"], hv.get("batch_stats", {})


def test_trunk_variables_requires_shared_backbone():
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = multihead.build_ensemble(model, vds, ["A", "B", "Real"],
                                   detect_shared_backbone=False)
    with pytest.raises(ValueError, match="shared-backbone"):
        add_head.trunk_variables(ens)


def test_splice_keeps_existing_heads_bit_identical(base_ensemble):
    trunk = add_head.trunk_variables(base_ensemble)
    hp, hs = _rand_head_vars(trunk)
    grown = add_head.splice_head(base_ensemble, "SynC", hp, hs)

    assert grown.class_names == ["SynA", "SynB", "SynC", "Real"]
    assert grown.num_heads == 3
    assert grown.shared_backbone  # trunk unchanged => still detected shared

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    old_ph = np.asarray(multihead.ensemble_per_head_logits(base_ensemble, x))
    new_ph = np.asarray(multihead.ensemble_per_head_logits(grown, x))
    # pre-existing heads: BIT identical (the trunk was never touched)
    np.testing.assert_array_equal(new_ph[:2], old_ph)

    # aggregated specialist columns for old classes identical too; the real
    # mean legitimately moves (it now averages one more head's real vote —
    # the reference's merge semantics, model_merger.py:75-91)
    old_agg = np.asarray(multihead.ensemble_forward(base_ensemble, x))
    new_agg = np.asarray(multihead.ensemble_forward(grown, x))
    np.testing.assert_array_equal(new_agg[:, :2], old_agg[:, :2])


def test_splice_rejects_duplicate_class(base_ensemble):
    trunk = add_head.trunk_variables(base_ensemble)
    hp, hs = _rand_head_vars(trunk)
    with pytest.raises(ValueError, match="already"):
        add_head.splice_head(base_ensemble, "SynA", hp, hs)


def test_splice_into_generic_artifact_keeps_generic_last():
    cfg = TrainConfig(batch_size=4, lr=1e-3)
    tr = joint.JointTrainer(
        cfg, synthetic_classes=["SynA"], spec_cfg=SPEC64,
        augment=SpecAugmentConfig(enabled=False), use_mesh=False,
        generic_head=True, log_dir="/tmp/tb_addhead_gen_test",
    )
    ens = tr.to_ensemble()
    assert ens.generic_head and ens.num_heads == 2
    trunk = add_head.trunk_variables(ens)
    hp, hs = _rand_head_vars(trunk)
    grown = add_head.splice_head(ens, "SynB", hp, hs)
    assert grown.generic_head
    assert grown.class_names == ["SynA", "SynB", "Real"]
    assert grown.num_heads == 3  # 2 specialists + generic

    # generic head must still be the LAST stacked head: its per-head logits
    # equal the original generic head's (stack index moved 1 -> 2)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)), jnp.float32)
    old_ph = np.asarray(multihead.ensemble_per_head_logits(ens, x))
    new_ph = np.asarray(multihead.ensemble_per_head_logits(grown, x))
    np.testing.assert_array_equal(new_ph[0], old_ph[0])   # SynA specialist
    np.testing.assert_array_equal(new_ph[2], old_ph[1])   # generic, now last


def test_grown_artifact_roundtrip(base_ensemble, tmp_path):
    from synthetic_audio_detection_tpu.checkpoints import serialization

    trunk = add_head.trunk_variables(base_ensemble)
    hp, hs = _rand_head_vars(trunk)
    grown = add_head.splice_head(base_ensemble, "SynC", hp, hs)
    p = str(tmp_path / "grown.ckpt")
    serialization.save_merged_native(p, grown)
    back = serialization.load_merged_native(p)
    assert back.class_names == ["SynA", "SynB", "SynC", "Real"]
    assert back.num_heads == 3


def test_head_adder_step_trains_only_the_head(base_ensemble):
    cfg = TrainConfig(batch_size=2, lr=1e-2)
    adder = add_head.HeadAdder(
        base_ensemble, "SynC", cfg, spec_cfg=SPEC64,
        augment=SpecAugmentConfig(enabled=False),
    )
    trunk_before = jax.tree_util.tree_map(np.copy, adder.trunk)
    rng = np.random.default_rng(2)
    batch = {
        "audio": rng.standard_normal((4, 32000)).astype(np.float32) * 0.2,
        "label": np.array([0, 1, 1, 0], np.int32),
        "weight": np.ones(4, np.float32),
    }
    p_before = jax.tree_util.tree_map(np.copy, adder.state.params)
    state, metrics = adder._step(adder.state, adder.trunk, batch,
                                 jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # head params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, p_before)
    assert any(jax.tree_util.tree_leaves(moved))
    # trunk untouched (it is not even part of the optimized state)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, adder.trunk, trunk_before)

    # eval step runs and counts rows
    sv = {"params": state.params, "batch_stats": state.batch_stats}
    st = adder._eval(sv, adder.trunk, batch)
    assert float(st["count"]) == 4.0
