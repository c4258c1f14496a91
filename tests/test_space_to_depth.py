"""Exactness of the space-to-depth conv folding (ops/space_to_depth.py) vs a
direct lax conv — the layer1 frontier reformulation must be bit-equivalent
in f32 before any perf claim."""

import numpy as np
import jax
import jax.numpy as jnp

from synthetic_audio_detection_tpu.ops.space_to_depth import (
    conv3x3_s2d,
    conv3x3_s2d_4phase,
    depth_to_space,
    fold_conv3x3_s2d,
    fold_conv3x3_s2d_phase,
    space_to_depth,
)


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_folded_conv_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d(space_to_depth(x), jnp.asarray(fold_conv3x3_s2d(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_4phase_folding_matches_direct(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    phases = [fold_conv3x3_s2d_phase(w, qy, qx)
              for qy in range(2) for qx in range(2)]
    got = np.asarray(depth_to_space(
        conv3x3_s2d_4phase(space_to_depth(x), phases)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_folded_conv_layer1_shape(rng):
    # the real frontier shape (batch kept tiny for CPU)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 64)).astype(np.float32))
    w = (rng.standard_normal((3, 3, 64, 64)) * 0.05).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d(space_to_depth(x), jnp.asarray(fold_conv3x3_s2d(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_merged_phase_folding_matches_direct(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_merged,
        fold_conv3x3_s2d_merged,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space(
        conv3x3_s2d_merged(space_to_depth(x),
                           jnp.asarray(fold_conv3x3_s2d_merged(w)))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_merged_traced_fold_matches_host_fold(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        fold_conv3x3_s2d_merged,
        fold_conv3x3_s2d_merged_traced,
    )

    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fold_conv3x3_s2d_merged_traced(jnp.asarray(w))),
        fold_conv3x3_s2d_merged(w),
    )


def test_h_only_folding_matches_direct(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv3x3_s2d_h,
        depth_to_space_h,
        fold_conv3x3_s2d_h,
        space_to_depth_h,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    w = rng.standard_normal((3, 3, 6, 7)).astype(np.float32)
    ref = np.asarray(_direct(x, jnp.asarray(w)))
    got = np.asarray(depth_to_space_h(
        conv3x3_s2d_h(space_to_depth_h(x), fold_conv3x3_s2d_h(w))
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_flax_s2d_stage1_exact_train_and_eval(rng):
    """BinaryClassifier(s2d_stage1=True) must be EXACTLY interchangeable with
    the standard model: identical param tree, equal eval logits, equal
    train-mode logits AND updated batch stats AND parameter gradients."""
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )

    a = BinaryClassifier(backbone="resnet18")
    b = BinaryClassifier(backbone="resnet18", s2d_stage1=True)
    # init at 512 so the s2d branch engages (stage-1 spatial = 128)
    va = init_classifier(a, jax.random.PRNGKey(0), input_size=512)
    vb = init_classifier(b, jax.random.PRNGKey(0), input_size=512)
    fa = jax.tree_util.tree_map(lambda x: x.shape, va)
    fb = jax.tree_util.tree_map(lambda x: x.shape, vb)
    assert fa == fb  # identical tree structure + shapes

    x = jnp.asarray(rng.standard_normal((2, 512, 512, 3)).astype(np.float32) * 0.3)

    ea = np.asarray(a.apply(va, x, train=False))
    eb = np.asarray(b.apply(va, x, train=False))  # a's params into b!
    np.testing.assert_allclose(eb, ea, rtol=1e-4, atol=1e-4)

    # Train-mode comparison happens at the BACKBONE (pre-head) level: the
    # head's BatchNorm1d over a batch of 2 amplifies accumulation-order noise
    # ~70x, which would force meaningless logit tolerances.
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    ra = create_resnet("resnet18")
    rb = create_resnet("resnet18", s2d_stage1=True)
    vr = ra.init({"params": jax.random.PRNGKey(2)}, x, train=False)

    def feat_loss(resnet, params):
        out, upd = resnet.apply(
            {"params": params, "batch_stats": vr["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2), (out, upd["batch_stats"])

    (la, (fa2, sa)), ga = jax.value_and_grad(
        lambda p: feat_loss(ra, p), has_aux=True)(vr["params"])
    (lb, (fb2, sb)), gb = jax.value_and_grad(
        lambda p: feat_loss(rb, p), has_aux=True)(vr["params"])
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fb2), np.asarray(fa2),
                               rtol=1e-3, atol=1e-3)
    # updated running stats for layer1 BNs must match
    for blk in ("layer1_0", "layer1_1"):
        for bn in ("bn1", "bn2"):
            for stat in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(sb[blk][bn][stat]),
                    np.asarray(sa[blk][bn][stat]),
                    rtol=1e-4, atol=1e-5,
                )
    # Gradients wrt the ORIGINAL kernels: in f32 the two association orders
    # differ by BN-backward cancellation noise (~0.7% Frobenius), so the
    # f32 bound is loose; the f64 check below is the real exactness claim.
    for blk in ("layer1_0", "layer1_1"):
        for cv in ("conv1", "conv2"):
            na = np.asarray(ga[blk][cv]["kernel"], np.float64)
            nb = np.asarray(gb[blk][cv]["kernel"], np.float64)
            rel = np.linalg.norm(nb - na) / (np.linalg.norm(na) + 1e-12)
            assert rel < 3e-2, (blk, cv, rel)


def test_flax_s2d_stage1_gradients_exact_f64(rng):
    """float64 ground truth: s2d-stage1 parameter gradients equal the
    standard model's to ~1e-13 relative — the reformulation is exact math,
    not an approximation (f32 runs differ only by reassociation noise)."""
    from synthetic_audio_detection_tpu.models.resnet import ResNet

    with jax.enable_x64():
        # reduced later stages: stage 1 (the s2d stage) keeps its full two
        # blocks, everything after is depth-1 — cuts f64-on-CPU cost ~4x
        ra = ResNet(block="basic", stage_sizes=(2, 1, 1, 1), dtype=jnp.float64)
        rb = ResNet(block="basic", stage_sizes=(2, 1, 1, 1), dtype=jnp.float64,
                    s2d_stage1=True)
        x = jnp.asarray(
            rng.standard_normal((1, 512, 512, 3)).astype(np.float64) * 0.3)
        vr = ra.init({"params": jax.random.PRNGKey(2)}, x, train=False)
        vr = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), vr)

        def loss(resnet, p):
            out, _ = resnet.apply(
                {"params": p, "batch_stats": vr["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out**2)

        ga = jax.grad(lambda p: loss(ra, p))(vr["params"])
        gb = jax.grad(lambda p: loss(rb, p))(vr["params"])
        for blk in ("layer1_0", "layer1_1"):
            for cv in ("conv1", "conv2"):
                na = np.asarray(ga[blk][cv]["kernel"])
                nb = np.asarray(gb[blk][cv]["kernel"])
                rel = np.linalg.norm(nb - na) / (np.linalg.norm(na) + 1e-300)
                assert rel < 1e-10, (blk, cv, rel)


def test_stem_h_folding_matches_direct(rng):
    # 7x7/2 SAME stem conv == H-folded [4,7,2C,F] conv on s2d_h input
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv7x7s2_s2d_h,
        fold_conv7x7s2_s2d_h,
        space_to_depth_h,
    )

    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((7, 7, 3, 8)) * 0.1).astype(np.float32))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    got = np.asarray(conv7x7s2_s2d_h(
        space_to_depth_h(x), fold_conv7x7s2_s2d_h(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stem_full_folding_matches_direct(rng):
    from synthetic_audio_detection_tpu.ops.space_to_depth import (
        conv7x7s2_s2d,
        fold_conv7x7s2_s2d,
    )

    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((7, 7, 3, 8)) * 0.1).astype(np.float32))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    got = np.asarray(conv7x7s2_s2d(
        space_to_depth(x), fold_conv7x7s2_s2d(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fast_backbone_s2d_stem_matches_plain(rng):
    # end-to-end through the functional fast backbone (f32 on CPU)
    from synthetic_audio_detection_tpu.models.classifier import (
        BinaryClassifier,
        init_classifier,
    )
    from synthetic_audio_detection_tpu.models.fast_resnet import (
        fast_backbone_apply,
    )

    model = BinaryClassifier()
    variables = init_classifier(model, jax.random.PRNGKey(0), input_size=64)
    bp, bs = variables["params"]["base"], variables["batch_stats"]["base"]
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(fast_backbone_apply(bp, bs, x, dtype=jnp.float32))
    for mode in ("h", "full"):
        got = np.asarray(fast_backbone_apply(bp, bs, x, dtype=jnp.float32,
                                             s2d_stem=mode))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"s2d_stem={mode}")
