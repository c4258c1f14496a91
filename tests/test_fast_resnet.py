"""Fast (GEMM-conv) backbone vs the Flax model — bf16 numerics."""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ensemble.multihead import (
    build_ensemble,
    ensemble_forward,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.models.fast_resnet import (
    fast_backbone_apply,
    fast_ensemble_forward,
)


def _shared(n=2, dtype=jnp.float32):
    model = BinaryClassifier(backbone="resnet18", dtype=dtype)
    base = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    vds = []
    for i in range(n):
        v = init_classifier(model, jax.random.PRNGKey(5 + i), input_size=64)
        v["params"]["base"] = base["params"]["base"]
        v["batch_stats"]["base"] = base["batch_stats"]["base"]
        vds.append(v)
    return build_ensemble(model, vds, [f"S{i}" for i in range(n)] + ["Real"])


def test_fast_backbone_matches_flax(rng):
    ens = _shared()
    base_params = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["params"]["base"])
    base_stats = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["batch_stats"]["base"])
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.4)

    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    resnet = create_resnet("resnet18", 3, jnp.bfloat16)
    ref = np.asarray(resnet.apply(
        {"params": base_params, "batch_stats": base_stats}, x, train=False
    )).astype(np.float32)
    got = np.asarray(fast_backbone_apply(base_params, base_stats, x)).astype(np.float32)
    assert got.shape == ref.shape
    # both bf16 compute; differences are accumulation-order level
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.2
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_fast_ensemble_matches_reference_rule(rng):
    ens = _shared()
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.4)
    ref = np.asarray(ensemble_forward(ens, x))
    got = np.asarray(fast_ensemble_forward(ens, x))
    assert got.shape == ref.shape
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99
    np.testing.assert_array_equal(ref.argmax(1), got.argmax(1))


def test_s2d_layer1_matches_plain_fast_path(rng):
    """The space-to-depth layer1 reformulation must be numerically equivalent
    to the plain fast path (f32: exact up to accumulation order). Input is
    512² so the stage-1 spatial size (128) actually engages the s2d gate."""
    from synthetic_audio_detection_tpu.ops import space_to_depth as s2d_mod

    ens = _shared()
    base_params = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["params"]["base"])
    base_stats = jax.tree_util.tree_map(
        lambda a: a[0], ens.variables["batch_stats"]["base"])
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)).astype(np.float32) * 0.4)

    calls = []
    orig = s2d_mod.space_to_depth_h

    def spy(a):
        calls.append(a.shape)
        return orig(a)

    s2d_mod.space_to_depth_h = spy
    try:
        plain = np.asarray(fast_backbone_apply(
            base_params, base_stats, x, dtype=jnp.float32))
        assert not calls
        s2d = np.asarray(fast_backbone_apply(
            base_params, base_stats, x, dtype=jnp.float32, s2d_layer1=True))
        assert calls, "s2d gate did not engage at 512² input"
    finally:
        s2d_mod.space_to_depth_h = orig
    np.testing.assert_allclose(s2d, plain, rtol=1e-4, atol=1e-4)


def test_s2d_layer1_traced_fold_matches_host_fold(rng):
    """fold_conv3x3_s2d_traced (einsum over the one-hot map, jit-safe) must
    equal the host numpy folding bit for bit."""
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        fold_conv3x3_s2d,
        fold_conv3x3_s2d_traced,
    )

    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fold_conv3x3_s2d_traced(jnp.asarray(w))),
        fold_conv3x3_s2d(w),
    )
