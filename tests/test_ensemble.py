"""Ensemble aggregation + decision-rule tests (SURVEY.md §4 plan c:
property tests of the any-strong-synthetic rule; model_merger.py:75-91,
inference_runner.py:194-214 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import (
    _aggregate,
    decide,
    labels_from_indices,
)


def test_aggregate_layout():
    # [N=3, B=2, 2] with distinct values: check [syn_1..syn_N, mean(real)]
    logits = np.zeros((3, 2, 2), np.float32)
    logits[:, 0, 0] = [1.0, 2.0, 3.0]   # real logits, item 0
    logits[:, 0, 1] = [10.0, 20.0, 30.0]  # synthetic logits, item 0
    logits[:, 1, 0] = [4.0, 4.0, 4.0]
    logits[:, 1, 1] = [-1.0, -2.0, -3.0]
    out = np.asarray(_aggregate(jnp.asarray(logits)))
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], [10.0, 20.0, 30.0, 2.0])
    np.testing.assert_allclose(out[1], [-1.0, -2.0, -3.0, 4.0])


def test_decide_real_requires_unanimity():
    # real mean high, all syn low → Real
    logits = jnp.asarray([[-3.0, -4.0, -5.0, 2.0]])
    v = decide(logits, threshold=0.5)
    assert int(v["label_idx"][0]) == 3 and bool(v["is_real"][0])


def test_decide_any_strong_synthetic_wins():
    # one confident synthetic head flips the verdict even with high real
    logits = jnp.asarray([[-3.0, 4.0, -5.0, 6.0]])
    v = decide(logits, threshold=0.5)
    assert not bool(v["is_real"][0])
    assert int(v["label_idx"][0]) == 1  # argmax over synthetic heads


def test_decide_low_real_also_synthetic():
    # real below threshold → synthetic argmax even if all syn below threshold
    logits = jnp.asarray([[-1.0, -0.5, -2.0, -3.0]])
    v = decide(logits, threshold=0.5)
    assert not bool(v["is_real"][0])
    assert int(v["label_idx"][0]) == 1


def test_decide_property_random(rng):
    """Property: is_real == (sigmoid(real) >= t) AND all(sigmoid(syn) < t)."""
    logits = rng.standard_normal((64, 7)).astype(np.float32) * 3
    t = 0.5
    v = decide(jnp.asarray(logits), threshold=t)
    probs = 1 / (1 + np.exp(-logits))
    expect_real = (probs[:, -1] >= t) & np.all(probs[:, :-1] < t, axis=1)
    np.testing.assert_array_equal(np.asarray(v["is_real"]), expect_real)
    # labels: Real index == N when real, else argmax syn
    lab = np.asarray(v["label_idx"])
    n = logits.shape[1] - 1
    np.testing.assert_array_equal(lab[expect_real], n)
    np.testing.assert_array_equal(
        lab[~expect_real], probs[~expect_real, :-1].argmax(1)
    )


def test_labels_from_indices():
    names = labels_from_indices(
        np.array([0, 2, 1]), ["SynA", "SynB"], "Real"
    )
    assert names == ["SynA", "Real", "SynB"]


def test_vmap_matches_loop(rng):
    """Stacked-vmap ensemble forward == per-model python loop (the reference's
    formulation, model_merger.py:78-85) on a tiny model."""
    from synthetic_audio_detection_tpu.ensemble.multihead import (
        build_ensemble,
        ensemble_forward,
    )
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i)) for i in range(3)]
    ens = build_ensemble(model, vds, ["A", "B", "C", "Real"],
                         detect_shared_backbone=False)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    fused = np.asarray(ensemble_forward(ens, x))

    per_head = [np.asarray(model.apply(v, x, train=False)) for v in vds]
    syn = np.stack([p[:, 1] for p in per_head], axis=1)
    real = np.mean(np.stack([p[:, 0] for p in per_head], axis=1), axis=1,
                   keepdims=True)
    expect = np.concatenate([syn, real], axis=1)
    np.testing.assert_allclose(fused, expect, rtol=1e-5, atol=1e-5)


def test_shared_backbone_path_matches_dense(rng):
    """shared_backbone=True fast path must equal the dense path when all
    backbones are identical (the reference-merged checkpoint case)."""
    from synthetic_audio_detection_tpu.ensemble.multihead import (
        build_ensemble,
        ensemble_forward,
    )
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )
    import dataclasses

    model = BinaryClassifier(backbone="resnet18")
    base = init_classifier(model, jax.random.PRNGKey(0))
    vds = []
    for i in range(2):
        v = init_classifier(model, jax.random.PRNGKey(10 + i))
        v["params"]["base"] = base["params"]["base"]
        v["batch_stats"]["base"] = base["batch_stats"]["base"]
        vds.append(v)
    ens = build_ensemble(model, vds, ["A", "B", "Real"])
    assert ens.shared_backbone  # auto-detected
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    fast = np.asarray(ensemble_forward(ens, x))
    dense = np.asarray(
        ensemble_forward(dataclasses.replace(ens, shared_backbone=False), x)
    )
    np.testing.assert_allclose(fast, dense, rtol=1e-5, atol=1e-5)


def test_reference_merge_semantics_head_only(tmp_path):
    """model_merger.py:50-55: trainer-style ckpts load into BinaryClassifier
    with strict=False, so ONLY head.* imports — merged backbones keep the
    donor ('ImageNet') weights. Default mode imports the trainer backbone
    too, so the two modes must produce different logits."""
    from synthetic_audio_detection_tpu.checkpoints import torch_compat, torch_pickle
    from synthetic_audio_detection_tpu.checkpoints.serialization import (
        save_submodel_torch,
    )
    from synthetic_audio_detection_tpu.ensemble.merger import merge_models
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    trained = init_classifier(model, jax.random.PRNGKey(1), input_size=64)
    donor = init_classifier(model, jax.random.PRNGKey(2), input_size=64)

    # trainer-style .pth: unprefixed timm backbone keys + head.* keys
    sd = torch_compat.torch_state_dict_from_variables(trained)
    trainer_sd = {
        (k[len("base."):] if k.startswith("base.") else k): v
        for k, v in sd.items()
    }
    torch_pickle.save(
        {"epoch": 0, "state_dict": trainer_sd, "best_acc": 0.9,
         "optimizer": {}, "scheduler": {}, "total_steps": 10},
        tmp_path / "sub.pth",
    )
    save_submodel_torch(str(tmp_path / "donor.pth"), donor)
    (tmp_path / "recipe.csv").write_text(
        "model_filename,synthetic_class,real_class\nsub.pth,SynA,Real\n"
    )

    ref = merge_models(
        str(tmp_path), str(tmp_path / "recipe.csv"), smoke_test=False,
        reference_semantics=True,
        backbone_weights=str(tmp_path / "donor.pth"),
    )
    full = merge_models(
        str(tmp_path), str(tmp_path / "recipe.csv"), smoke_test=False,
    )

    # reference mode: backbone == donor, head == trained
    np.testing.assert_allclose(
        np.asarray(ref.variables["params"]["base"]["conv1"]["kernel"][0]),
        np.asarray(donor["params"]["base"]["conv1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(ref.variables["params"]["head"]["fc1"]["kernel"][0]),
        np.asarray(trained["params"]["head"]["fc1"]["kernel"]),
    )
    # default mode: backbone == trained
    np.testing.assert_allclose(
        np.asarray(full.variables["params"]["base"]["conv1"]["kernel"][0]),
        np.asarray(trained["params"]["base"]["conv1"]["kernel"]),
    )
    # and the two modes really diverge
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    assert not np.allclose(np.asarray(ref(x)), np.asarray(full(x)))

    with pytest.raises(ValueError, match="backbone-weights"):
        merge_models(
            str(tmp_path), str(tmp_path / "recipe.csv"),
            smoke_test=False, reference_semantics=True,
        )


def test_merge_from_native_checkpoint(tmp_path):
    """Recipe rows may name the trainer's PRIMARY output (native msgpack
    .ckpt), not only the torch .pth twin — the merger dispatches on
    extension. Regression: native rows used to hit the torch unpickler and
    die with 'unregistered extension code'."""
    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.ensemble.merger import merge_models
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    trained = init_classifier(model, jax.random.PRNGKey(5), input_size=64)
    serialization.save_native(
        str(tmp_path / "sub.ckpt"),
        {"variables": trained},
        metadata={"epoch": 3, "best_acc": 0.9},
    )
    (tmp_path / "recipe.csv").write_text(
        "model_filename,synthetic_class,real_class\nsub.ckpt,SynA,Real\n"
    )
    ens = merge_models(
        str(tmp_path), str(tmp_path / "recipe.csv"), smoke_test=False
    )
    assert ens.class_names == ["SynA", "Real"]
    np.testing.assert_allclose(
        np.asarray(ens.variables["params"]["head"]["fc1"]["kernel"][0]),
        np.asarray(trained["params"]["head"]["fc1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(ens.variables["params"]["base"]["conv1"]["kernel"][0]),
        np.asarray(trained["params"]["base"]["conv1"]["kernel"]),
    )


def test_shared_trunk_path_matches_dense(rng):
    """shared_trunk_stages fast path (trunk once + vmapped per-head layer4 +
    heads — the joint trainer's per_head_stages artifacts, train/joint.py)
    must equal the dense per-sub-model path, and must be auto-detected when
    the sub-models agree everywhere except layer4."""
    import dataclasses

    from synthetic_audio_detection_tpu.ensemble.multihead import (
        build_ensemble,
        ensemble_forward,
        trunk_shared_stages,
    )
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    model = BinaryClassifier(backbone="resnet18")
    donor = init_classifier(model, jax.random.PRNGKey(0))
    vds = []
    for i in range(2):
        v = init_classifier(model, jax.random.PRNGKey(10 + i))
        # share every backbone module EXCEPT layer4 (per-head tail)
        v["params"]["base"] = {
            k: (x if k.startswith("layer4") else donor["params"]["base"][k])
            for k, x in v["params"]["base"].items()
        }
        v["batch_stats"]["base"] = {
            k: (x if k.startswith("layer4")
                else donor["batch_stats"]["base"][k])
            for k, x in v["batch_stats"]["base"].items()
        }
        vds.append(v)
    assert trunk_shared_stages(vds) == 1
    ens = build_ensemble(model, vds, ["A", "B", "Real"])
    assert not ens.shared_backbone
    assert ens.shared_trunk_stages == 1

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    fast = np.asarray(ensemble_forward(ens, x))
    dense = np.asarray(
        ensemble_forward(dataclasses.replace(ens, shared_trunk_stages=0), x)
    )
    np.testing.assert_allclose(fast, dense, rtol=1e-5, atol=1e-5)

    # fully independent backbones: no trunk sharing detected
    free = [init_classifier(model, jax.random.PRNGKey(50 + i)) for i in range(2)]
    assert trunk_shared_stages(free) == 0
    assert build_ensemble(model, free, ["A", "B", "Real"]).shared_trunk_stages == 0
