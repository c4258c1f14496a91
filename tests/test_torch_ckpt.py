"""Torch checkpoint round-trip + logit-parity tests (SURVEY.md §4 plan a/d).

Uses real torch (CPU) as the oracle for both the .pth container format and the
model forward pass. The library itself never imports torch.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from synthetic_audio_detection_tpu.checkpoints import (
    serialization,
    torch_compat,
    torch_pickle,
)
from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier

import torch_ref


# ---------------------------------------------------------------------------
# Container format
# ---------------------------------------------------------------------------

def test_read_torch_saved_zip(tmp_path, rng):
    obj = {
        "epoch": 3,
        "best_acc": 0.985,
        "state_dict": {
            "w": torch.from_numpy(rng.standard_normal((4, 5)).astype(np.float32)),
            "b": torch.from_numpy(rng.standard_normal(7).astype(np.float64)),
            "i": torch.arange(11),
        },
        "names": ["a", "b"],
        "nothing": None,
    }
    p = tmp_path / "t.pth"
    torch.save(obj, str(p))
    got = torch_pickle.load(str(p))
    assert got["epoch"] == 3 and got["best_acc"] == 0.985
    assert got["names"] == ["a", "b"] and got["nothing"] is None
    np.testing.assert_array_equal(got["state_dict"]["w"], obj["state_dict"]["w"].numpy())
    np.testing.assert_array_equal(got["state_dict"]["b"], obj["state_dict"]["b"].numpy())
    np.testing.assert_array_equal(got["state_dict"]["i"], obj["state_dict"]["i"].numpy())


def test_read_torch_saved_legacy(tmp_path, rng):
    obj = {"w": torch.from_numpy(rng.standard_normal((3, 2)).astype(np.float32))}
    p = tmp_path / "legacy.pth"
    torch.save(obj, str(p), _use_new_zipfile_serialization=False)
    got = torch_pickle.load(str(p))
    np.testing.assert_array_equal(got["w"], obj["w"].numpy())


def test_torch_reads_our_writer(tmp_path, rng):
    obj = {
        "state_dict": {
            "x": rng.standard_normal((2, 3, 4)).astype(np.float32),
            "y": np.arange(6, dtype=np.int64),
        },
        "metadata": {"class_names": ["SynA", "SynB", "Real"]},
        "epoch": 12,
        "acc": 0.5,
        "flag": True,
    }
    p = tmp_path / "ours.pth"
    torch_pickle.save(obj, str(p))
    got = torch.load(str(p), map_location="cpu", weights_only=False)
    assert got["epoch"] == 12 and got["acc"] == 0.5 and got["flag"] is True
    assert got["metadata"]["class_names"] == ["SynA", "SynB", "Real"]
    np.testing.assert_array_equal(got["state_dict"]["x"].numpy(), obj["state_dict"]["x"])
    np.testing.assert_array_equal(got["state_dict"]["y"].numpy(), obj["state_dict"]["y"])


def test_bf16_tensor_read(tmp_path):
    """bf16 storages widen to float32 exactly (zero-padded mantissa)."""
    t = torch.randn(5, 3, dtype=torch.bfloat16)
    p = tmp_path / "bf16.pth"
    torch.save({"w": t}, str(p))
    got = torch_pickle.load(str(p))
    np.testing.assert_allclose(got["w"], t.float().numpy(), atol=0)
    assert got["w"].dtype == np.float32


def test_blocked_unpickle_raises(tmp_path):
    import pickle

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    p = tmp_path / "evil.pth"
    # hand-build a zip-format ckpt with a malicious pickle
    import zipfile

    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(Evil()))
    with pytest.raises(Exception):
        torch_pickle.load(str(p))


# ---------------------------------------------------------------------------
# Model parity: torch BinaryClassifier ↔ flax BinaryClassifier
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = torch_ref.TorchBinaryClassifier("resnet18")
    torch_ref.randomize_bn_stats(m, seed=3)
    m.eval()
    return m


def test_classifier_logit_parity(torch_model, rng):
    """Imported torch weights must reproduce torch logits (float tolerance) —
    the BASELINE.json round-trip requirement, on a small random model."""
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_compat.classifier_variables_from_torch(sd, base_prefix="base.")

    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = BinaryClassifier(backbone="resnet18")
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_trainer_style_import(torch_model, rng):
    """Trainer checkpoints carry unprefixed backbone keys + head.* —
    submodel_trainer.py:707-714. Import must land in the same tree."""
    sd_cls = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    # re-key as the trainer saves: strip 'base.' (model attribute order differs
    # but key names are what matters)
    sd_trainer = {}
    for k, v in sd_cls.items():
        sd_trainer[k[len("base."):] if k.startswith("base.") else k] = v
    v_a = torch_compat.classifier_variables_from_torch(sd_cls, base_prefix="base.")
    v_b = torch_compat.classifier_variables_from_torch(sd_trainer, base_prefix="")
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(v_a), jax.tree_util.tree_leaves(v_b)):
        np.testing.assert_array_equal(a, b)


def test_export_import_roundtrip(torch_model):
    """flax → torch key space → flax must be the identity."""
    import jax

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = torch_compat.classifier_variables_from_torch(sd, base_prefix="base.")
    sd2 = torch_compat.torch_state_dict_from_variables(variables)
    variables2 = torch_compat.classifier_variables_from_torch(sd2, base_prefix="base.")
    ta, tb = jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(variables2)
    assert len(ta) == len(tb)
    for a, b in zip(ta, tb):
        np.testing.assert_array_equal(a, b)
    # and the exported key space matches torch's own (minus num_batches_tracked)
    torch_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(sd2.keys()) == torch_keys


def test_merged_checkpoint_roundtrip(tmp_path, torch_model, rng):
    """Our merged-.pth writer → torch loads it; our loader reproduces logits of
    a reference-style merged ensemble saved by torch."""
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    merged_sd = {}
    for i in range(2):
        for k, v in sd.items():
            merged_sd[f"sub_models.{i}.{k}"] = torch.from_numpy(v.copy())
    p = tmp_path / "merged.pth"
    torch.save(
        {"state_dict": merged_sd,
         "metadata": {"class_names": ["SynA", "SynB", "Real"]}},
        str(p),
    )

    ens = serialization.load_merged_torch(str(p), backbone="resnet18")
    assert ens.class_names == ["SynA", "SynB", "Real"]
    assert ens.num_heads == 2
    assert ens.shared_backbone  # identical backbones detected

    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        per_head = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    # reference aggregation: [syn_1, syn_2, mean(real)] with identical heads
    expected = np.stack(
        [per_head[:, 1], per_head[:, 1], per_head[:, 0]], axis=1
    )
    got = np.asarray(ens(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=2e-4)

    # round-trip back out through our writer and into torch
    q = tmp_path / "ours_merged.pth"
    serialization.save_merged_torch(str(q), ens)
    back = torch.load(str(q), map_location="cpu", weights_only=False)
    assert back["metadata"]["class_names"] == ["SynA", "SynB", "Real"]
    for k, v in back["state_dict"].items():
        np.testing.assert_allclose(
            v.numpy(), merged_sd[k].numpy(), rtol=1e-6, atol=1e-7,
            err_msg=k,
        )
