"""Generic Real-vs-any-synthetic head: label derivation, joint-trainer
round-trip, serving schema invariance, and the --generic-verdict decision.

The LOGO study measured unseen-generator AUC at chance for specialist heads
in BOTH label regimes (docs/PERFORMANCE.md); the generic head is the first
lever aimed at the ranking itself — its training signal (positive = any
synthetic class) rewards generator-agnostic artifact cues. Reference
counterpart: the aggregation being extended is model_merger.py:75-91."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble import multihead
from synthetic_audio_detection_tpu.train import joint
from synthetic_audio_detection_tpu.utils.config import (
    InferenceConfig,
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)

SPEC64 = SpectrogramConfig(out_size=64)


def test_per_head_binary_labels_generic():
    labels = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)  # 0=Real, 1..3 synth
    y = joint.per_head_binary_labels(labels, num_heads=4, generic_head=True)
    expect = np.array(
        [
            [0, 1, 0, 0, 1],  # specialist 0: class 1
            [0, 0, 1, 0, 0],  # specialist 1: class 2
            [0, 0, 0, 1, 0],  # specialist 2: class 3
            [0, 1, 1, 1, 1],  # generic: ANY synthetic
        ],
        np.int32,
    )
    np.testing.assert_array_equal(np.asarray(y), expect)


def test_per_head_own_mask_generic_sees_everything():
    labels = jnp.asarray([0, 1, 2, 1], jnp.int32)
    w = joint.per_head_own_mask(labels, num_heads=3, weights=None,
                                generic_head=True)
    expect = np.array(
        [
            [1, 1, 0, 1],  # specialist 0: Real + class 1
            [1, 0, 1, 0],  # specialist 1: Real + class 2
            [1, 1, 1, 1],  # generic: every row is its own class
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(w), expect)
    # pad mask composes
    pad = jnp.asarray([1, 1, 1, 0], jnp.float32)
    w2 = joint.per_head_own_mask(labels, 3, pad, generic_head=True)
    np.testing.assert_array_equal(np.asarray(w2), expect * np.asarray(pad))


@pytest.fixture(scope="module")
def generic_trainer():
    cfg = TrainConfig(batch_size=4, lr=1e-3)
    return joint.JointTrainer(
        cfg, synthetic_classes=["SynA", "SynB"], spec_cfg=SPEC64,
        augment=SpecAugmentConfig(enabled=False), use_mesh=False,
        generic_head=True, log_dir="/tmp/tb_generic_test",
    )


def _batch():
    rng = np.random.default_rng(1)
    return {
        "audio": rng.standard_normal((4, 32000)).astype(np.float32) * 0.2,
        "label": np.array([0, 1, 2, 1], np.int32),
        "weight": np.ones(4, np.float32),
    }


def test_generic_trainer_shapes_and_step(generic_trainer):
    tr = generic_trainer
    assert tr.num_heads == 3  # 2 specialists + generic
    assert tr.class_names == ["SynA", "SynB", "Real"]  # schema unchanged
    state, metrics = tr._train_step(tr.state, _batch(), jax.random.PRNGKey(0))
    assert metrics["per_head_loss"].shape == (3,)
    assert np.isfinite(float(metrics["loss"]))
    tr.state = state

    stats = tr._eval_step(tr.variables(), _batch())
    assert stats["confusion"].shape == (3, 2, 2)
    # detector score == the generic head's synthetic softmax probability
    # (bounded in [0,1]); shape is per-row
    det = np.asarray(stats["det_score"])
    assert det.shape == (4,) and (det >= 0).all() and (det <= 1).all()


def test_generic_ensemble_roundtrip_and_serving_schema(generic_trainer, tmp_path):
    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline

    ens = generic_trainer.to_ensemble()
    assert ens.generic_head and ens.num_heads == 3
    assert ens.synthetic_names == ["SynA", "SynB"]

    p = str(tmp_path / "gen.ckpt")
    serialization.save_merged_native(p, ens)
    back = serialization.load_merged_native(p)
    assert back.generic_head and back.num_heads == 3
    assert back.class_names == ["SynA", "SynB", "Real"]

    # torch twin carries the flag too
    pt = str(tmp_path / "gen.pth")
    serialization.save_merged_torch(pt, ens)
    back_t = serialization.load_merged_torch(pt)
    assert back_t.generic_head and back_t.num_heads == 3

    # serving: JSON schema is the reference's — generic column invisible
    pipe = InferencePipeline(
        back, spec=SPEC64, infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )
    rng = np.random.default_rng(3)
    windows = (rng.standard_normal((3, 128_000)) * 0.3).astype(np.float32)
    logits = pipe.logits_for_windows(windows)
    assert logits.shape == (3, 4)  # 2 spec + generic + real mean
    res = pipe.analyze_windows(windows, [(0.0, 4.0)] * 3)
    assert set(res["percentages"]) == {"SynA", "SynB", "Real"}
    for seg in res["segments"]:
        assert seg["label"] in ("SynA", "SynB", "Real")
    # smoothing keeps the schema and renormalizes the VISIBLE columns
    res_s = pipe.analyze_windows(windows, [(0.0, 4.0)] * 3, smooth=True)
    assert set(res_s["percentages"]) == {"SynA", "SynB", "Real"}
    assert sum(res_s["percentages"].values()) == pytest.approx(100.0, abs=0.1)


def test_generic_verdict_decision_logic(generic_trainer):
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline

    ens = generic_trainer.to_ensemble()
    pipe = InferencePipeline(
        ens, spec=SPEC64,
        infer=InferenceConfig(batch_size=8, generic_verdict=True),
        use_pallas=False,
    )
    probs = np.array(
        [
            # [SynA, SynB, generic, Real]
            [0.9, 0.1, 0.2, 0.1],   # specialists strong but generic low
            [0.1, 0.1, 0.8, 0.9],   # generic high despite Real-looking cols
        ],
        np.float32,
    )
    vis, generic = pipe._split_generic(probs)
    np.testing.assert_allclose(generic, [0.2, 0.8])
    np.testing.assert_allclose(vis, [[0.9, 0.1, 0.1], [0.1, 0.1, 0.9]])
    is_real = pipe._decide_rows(vis[:, :-1], vis[:, -1], generic)
    # generic verdict: ONLY the generic column decides (thr 0.5)
    np.testing.assert_array_equal(is_real, [True, False])

    # reference rule on the same rows for contrast (generic col ignored)
    pipe_ref = InferencePipeline(
        ens, spec=SPEC64, infer=InferenceConfig(batch_size=8),
        use_pallas=False,
    )
    is_real_ref = pipe_ref._decide_rows(vis[:, :-1], vis[:, -1], generic)
    np.testing.assert_array_equal(is_real_ref, [False, True])


def test_generic_verdict_requires_generic_head():
    from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = multihead.build_ensemble(model, vds, ["A", "B", "Real"],
                                   detect_shared_backbone=False)
    with pytest.raises(ValueError, match="generic"):
        InferencePipeline(
            ens, spec=SPEC64,
            infer=InferenceConfig(batch_size=8, generic_verdict=True),
            use_pallas=False,
        )


def test_build_ensemble_generic_head_count_check():
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    with pytest.raises(ValueError, match="stacked heads"):
        multihead.build_ensemble(model, vds, ["A", "B", "Real"],
                                 generic_head=True)
