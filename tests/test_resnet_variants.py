"""Backbone-variant parity vs torch: bottleneck blocks (resnet50) and the
full model zoo's shape contract (SURVEY.md §2.2 — ResNet-18/34/50/101/152)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.checkpoints import torch_compat
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.models.resnet import backbone_num_features

import torch_ref


def test_resnet50_logit_parity(rng):
    """Bottleneck topology (1x1 → 3x3-strided → 1x1, downsample) must
    reproduce torch logits from imported weights."""
    torch.manual_seed(11)
    tm = torch_ref.TorchBinaryClassifier("resnet50")
    torch_ref.randomize_bn_stats(tm, seed=5)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_compat.classifier_variables_from_torch(sd, base_prefix="base.")

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = BinaryClassifier(backbone="resnet50")
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("name,feats", [
    ("resnet18", 512), ("resnet26", 2048), ("resnet34", 512),
    ("resnet50", 2048), ("resnet101", 2048), ("resnet152", 2048),
    ("resnet200", 2048),
])
def test_model_zoo_shapes(name, feats):
    assert backbone_num_features(name) == feats
    model = BinaryClassifier(backbone=name)
    variables = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 2)
    # head fc1 consumes the right feature width
    assert variables["params"]["head"]["fc1"]["kernel"].shape[0] == feats


def test_resnet26_logit_parity(rng):
    """timm resnet26 (vanilla bottleneck [2,2,2,2]) — added to cover the
    reference's wider --model-name surface (submodel_trainer.py:51-52)."""
    import torch

    from synthetic_audio_detection_tpu.checkpoints import torch_compat
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier

    tm = torch_ref.TorchBinaryClassifier("resnet26")
    tm.eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_compat.classifier_variables_from_torch(sd, base_prefix="base.")
    model = BinaryClassifier(backbone="resnet26")
    got = np.asarray(
        model.apply(variables, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_stage_slice_composes_to_full_model(name):
    """A trunk (stages 1..3) followed by a tail (stage 4) — the stacked-head
    seam the joint trainer's per_head_stages mode uses (train/joint.py) —
    must reproduce the full backbone bit-for-bit, and the sliced modules'
    param trees must be exactly the corresponding subtrees of the full key
    space (so trunk ∪ tail re-assembles a loadable full checkpoint)."""
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    full = create_resnet(name)
    fv = full.init({"params": rng}, x, train=False)
    out_full = full.apply(fv, x, train=False)

    trunk = create_resnet(name, last_stage=3)
    tail = create_resnet(name, first_stage=4)
    tp = {k: v for k, v in fv["params"].items() if not k.startswith("layer4")}
    lp = {k: v for k, v in fv["params"].items() if k.startswith("layer4")}
    tb = {k: v for k, v in fv["batch_stats"].items() if not k.startswith("layer4")}
    lb = {k: v for k, v in fv["batch_stats"].items() if k.startswith("layer4")}
    mid = trunk.apply({"params": tp, "batch_stats": tb}, x, train=False)
    out = tail.apply({"params": lp, "batch_stats": lb}, mid, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_full))
    assert mid.shape[-1] == trunk.num_features
    assert out.shape[-1] == tail.num_features == backbone_num_features(name)

    # a fresh tail init has exactly the full model's layer4 subtree key space
    ti = tail.init({"params": rng}, mid, train=False)
    tsl = jax.tree_util.tree_structure(ti["params"])
    assert tsl == jax.tree_util.tree_structure(lp)
    for a, b in zip(jax.tree_util.tree_leaves(ti["params"]),
                    jax.tree_util.tree_leaves(lp)):
        assert a.shape == b.shape


def test_stage_slice_rejects_bad_ranges():
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    x = jnp.zeros((1, 64, 64, 3))
    for first, last in ((0, 4), (3, 2), (1, 5)):
        m = create_resnet("resnet18", first_stage=first, last_stage=last)
        with pytest.raises(ValueError, match="stage slice"):
            m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
