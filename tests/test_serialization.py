"""Native msgpack checkpoint round-trips (merged ensembles + train state)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.checkpoints import serialization
from synthetic_audio_detection_tpu.ensemble.multihead import (
    build_ensemble,
    ensemble_forward,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)


def _tiny_ensemble(n=2):
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(n)]
    return build_ensemble(model, vds, [f"S{i}" for i in range(n)] + ["Real"],
                          detect_shared_backbone=False)


def test_merged_native_roundtrip(tmp_path, rng):
    ens = _tiny_ensemble()
    p = str(tmp_path / "merged.msgpack")
    serialization.save_merged_native(p, ens)
    back = serialization.load_merged_native(p)
    assert back.class_names == ens.class_names
    assert back.num_heads == 2
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ensemble_forward(back, x)),
        np.asarray(ensemble_forward(ens, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_load_merged_autodetects_format(tmp_path):
    ens = _tiny_ensemble()
    native = str(tmp_path / "m.msgpack")
    torch_p = str(tmp_path / "m.pth")
    serialization.save_merged_native(native, ens)
    serialization.save_merged_torch(torch_p, ens)
    a = serialization.load_merged(native)
    b = serialization.load_merged(torch_p)
    assert a.class_names == b.class_names == ens.class_names


def test_save_native_handles_structured_state(tmp_path):
    """optax states (named tuples) must serialize via to_state_dict."""
    import optax

    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import TrainConfig

    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(
        model, jax.random.PRNGKey(0), TrainConfig(), input_size=64
    )
    p = str(tmp_path / "train.ckpt")
    serialization.save_native(
        p, {"opt_state": state.opt_state}, metadata={"step": 5}
    )
    tree, meta = serialization.load_native(p)
    assert meta["step"] == 5
    from flax import serialization as flax_ser

    restored = flax_ser.from_state_dict(state.opt_state, tree["opt_state"])
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
