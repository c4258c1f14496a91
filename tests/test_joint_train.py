"""Joint multi-head ensemble training (train/joint.py).

Oracle strategy: the vmapped N-heads-in-one-step formulation is pinned
against an explicit per-head Python loop computing the same mean-CE loss
(two independent formulations of the same math — the loop is what the
reference's sequential per-head training does per batch, modulo the shared
backbone), plus an end-to-end tiny-corpus run whose merged artifact must
round-trip into the serving ensemble with the shared-backbone fast path
detected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_audio_detection_tpu.train import joint, steps
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)

SPEC64 = SpectrogramConfig(out_size=64)


def test_per_head_binary_labels():
    labels = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)  # 0=Real, 1..3 synth
    y = joint.per_head_binary_labels(labels, num_heads=3)
    expect = np.array(
        [
            [0, 1, 0, 0, 1],  # head 0: class 1
            [0, 0, 1, 0, 0],  # head 1: class 2
            [0, 0, 0, 1, 0],  # head 2: class 3
        ],
        np.int32,
    )
    np.testing.assert_array_equal(np.asarray(y), expect)


@pytest.fixture(scope="module")
def joint_setup():
    cfg = TrainConfig(batch_size=2, lr=1e-3)
    state, tx = joint.init_joint_state(
        "resnet18", 2, jax.random.PRNGKey(0), cfg, (64, 64)
    )
    return cfg, state, tx


def _batch(num_classes=3):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((4, 32000)).astype(np.float32) * 0.2
    return {
        "audio": audio,
        "label": np.array([0, 1, 2, 1], np.int32)[: audio.shape[0]],
        "weight": np.ones(audio.shape[0], np.float32),
    }


def test_joint_step_matches_per_head_loop(joint_setup):
    """Grad + update equality: the vmapped joint step vs an explicit loop
    over heads computing mean-CE with the same RNG discipline."""
    cfg, state, tx = joint_setup
    augment = SpecAugmentConfig(enabled=False)
    step = jax.jit(joint.make_joint_train_step(
        "resnet18", tx, cfg, SPEC64, augment, num_heads=2
    ))
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    new_state, metrics = step(state, batch, rng)

    # ---- oracle: same math, explicit loop, no vmap --------------------------
    from synthetic_audio_detection_tpu.models.head import BinaryHead
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    rng_mask, rng_drop = jax.random.split(rng)
    x = steps._features_from_waveforms(
        jnp.asarray(batch["audio"]), SPEC64, augment, rng_mask, 32_000
    )
    labels = jnp.asarray(batch["label"])
    weights = jnp.asarray(batch["weight"])
    drop_rngs = jax.random.split(rng_drop, 2)
    y_nb = joint.per_head_binary_labels(labels, 2)

    def loop_loss(params):
        base = create_resnet("resnet18", 3, jnp.float32, module_name="base")
        feats, _ = base.apply(
            {"params": params["base"], "batch_stats": state.batch_stats["base"]},
            x, train=True, mutable=["batch_stats"],
        )
        head = BinaryHead()
        losses = []
        for h in range(2):
            hp = jax.tree_util.tree_map(lambda a, h=h: a[h], params["heads"])
            hs = jax.tree_util.tree_map(
                lambda a, h=h: a[h], state.batch_stats["heads"]
            )
            out, _ = head.apply(
                {"params": hp, "batch_stats": hs}, feats, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rngs[h]},
            )
            losses.append(steps.cross_entropy(out, y_nb[h], weights))
        return jnp.stack(losses).mean()

    loss_oracle, grads_oracle = jax.value_and_grad(loop_loss)(state.params)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_oracle), rtol=1e-5
    )

    # gradient equality: the vmapped formulation re-derived eagerly vs the
    # loop oracle. (Pinning POST-Adam params instead would amplify last-ulp
    # gradient differences on near-zero entries to ±lr — Adam's first-step
    # update is ~lr·sign(g) — so the equality contract lives at the grads.)
    def vmap_loss(params):
        from synthetic_audio_detection_tpu.models.resnet import create_resnet

        base = create_resnet("resnet18", 3, jnp.float32, module_name="base")
        feats, _ = base.apply(
            {"params": params["base"], "batch_stats": state.batch_stats["base"]},
            x, train=True, mutable=["batch_stats"],
        )
        logits_nb, _ = joint._head_forward_train(
            BinaryHead(), params["heads"], state.batch_stats["heads"], feats,
            drop_rngs,
        )
        per_head = jax.vmap(steps.cross_entropy, in_axes=(0, 0, None))(
            logits_nb, y_nb, weights
        )
        return per_head.mean()

    grads_vmap = jax.grad(vmap_loss)(state.params)
    flat_v, _ = jax.tree_util.tree_flatten(grads_vmap)
    flat_o, _ = jax.tree_util.tree_flatten(grads_oracle)
    for gv, go in zip(flat_v, flat_o):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(go),
                                   rtol=1e-4, atol=1e-6)

    # and the step's own update moved the trainable params (head + layer4)
    assert not np.array_equal(
        np.asarray(new_state.params["heads"]["out"]["kernel"]),
        np.asarray(state.params["heads"]["out"]["kernel"]),
    )


def test_joint_step_freeze_and_head_independence(joint_setup):
    """Frozen backbone stages stay bit-identical; layer4 and BOTH heads move;
    the two heads move differently (independent inits + different labels)."""
    cfg, state, tx = joint_setup
    step = jax.jit(joint.make_joint_train_step(
        "resnet18", tx, cfg, SPEC64, SpecAugmentConfig(enabled=False),
        num_heads=2,
    ))
    new_state, _ = step(state, _batch(), jax.random.PRNGKey(3))
    p0, p1 = state.params, new_state.params
    np.testing.assert_array_equal(
        np.asarray(p0["base"]["conv1"]["kernel"]),
        np.asarray(p1["base"]["conv1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p0["base"]["layer1_0"]["conv1"]["kernel"]),
        np.asarray(p1["base"]["layer1_0"]["conv1"]["kernel"]),
    )
    assert not np.array_equal(
        np.asarray(p0["base"]["layer4_0"]["conv1"]["kernel"]),
        np.asarray(p1["base"]["layer4_0"]["conv1"]["kernel"]),
    )
    dh = np.asarray(p1["heads"]["fc1"]["kernel"]) - np.asarray(
        p0["heads"]["fc1"]["kernel"]
    )
    assert np.abs(dh[0]).max() > 0 and np.abs(dh[1]).max() > 0
    assert not np.array_equal(dh[0], dh[1])
    # head BN stats updated per head and differ (different fc1 outputs)
    s0 = np.asarray(new_state.batch_stats["heads"]["bn1"]["mean"])
    assert s0.shape[0] == 2 and not np.array_equal(s0[0], s0[1])


def _make_corpus(tmp_path, classes=("Real", "SynA", "SynB"), n=2):
    from synthetic_audio_detection_tpu.audio import wavio

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cls in classes:
            d = tmp_path / "data" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                y = (rng.standard_normal(128_000) * 0.2).astype(np.float32)
                wavio.write_wav(str(d / f"{cls}_{i}.wav"), y[None, :], 32_000)
    return str(tmp_path / "data")


def test_joint_trainer_end_to_end(tmp_path):
    """Tiny-corpus fit → merged artifacts load into the serving ensemble with
    the shared backbone detected; resume restores epoch/step."""
    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.train.joint import JointTrainer

    data_dir = _make_corpus(tmp_path)
    cfg = TrainConfig(
        data_dir=data_dir, batch_size=2, epochs=2, lr=1e-2, workers=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    t = JointTrainer(cfg, synthetic_classes=["SynA", "SynB"],
                     spec_cfg=SPEC64, use_mesh=False,
                     log_dir=str(tmp_path / "tb"))
    t.fit()
    ckpt = tmp_path / "ck" / "joint_model.ckpt"
    assert ckpt.exists()
    assert (tmp_path / "ck" / "joint_model.ckpt.merged.ckpt").exists()
    assert (tmp_path / "ck" / "joint_model.ckpt.merged.pth").exists()

    # merged native artifact → serving ensemble, shared backbone detected
    ens = serialization.load_merged_native(
        str(tmp_path / "ck" / "joint_model.ckpt.merged.ckpt")
    )
    assert ens.shared_backbone
    assert ens.class_names == ["SynA", "SynB", "Real"]
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = jax.jit(lambda xx: ens(xx))(x)
    assert out.shape == (2, 3)  # [B, N+1]

    # the torch twin round-trips through the reference merged contract
    ens_t = serialization.load_merged_torch(
        str(tmp_path / "ck" / "joint_model.ckpt.merged.pth")
    )
    out_t = ens_t(x)
    # rtol-level agreement: the twin reloads through the dense (per-sub-model)
    # path whose reduction order differs from the shared-backbone fast path
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out),
                               rtol=2e-5, atol=1e-4)

    # resume restores the trainer at saved epoch + 1 (resume from an explicit
    # save of the FINAL state — the best checkpoint may be an earlier epoch)
    final = str(tmp_path / "ck" / "final.ckpt")
    t.save_checkpoint(epoch=cfg.epochs - 1, path=final)
    t2 = JointTrainer(cfg, synthetic_classes=["SynA", "SynB"],
                      spec_cfg=SPEC64, use_mesh=False,
                      log_dir=str(tmp_path / "tb2"))
    t2.resume(final)
    assert t2.start_epoch == cfg.epochs
    got, exp = jax.tree_util.tree_flatten(t2.state.params)[0], \
        jax.tree_util.tree_flatten(t.state.params)[0]
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


_SHARDED_SELFTEST = r"""
import jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np, optax
from synthetic_audio_detection_tpu.train import joint
from synthetic_audio_detection_tpu.parallel import sharding as sh
from synthetic_audio_detection_tpu.utils.config import (
    TrainConfig, SpectrogramConfig, SpecAugmentConfig)

cfg = TrainConfig(batch_size=2)
spec = SpectrogramConfig(out_size=64)
state, _ = joint.init_joint_state('resnet18', 2, jax.random.PRNGKey(0), cfg,
                                  spec.model_input_hw())
# Large Adam eps so the comparison is robust: with eps=1e-8 a last-ulp
# gradient difference on a near-zero entry (cross-device reduction order) is
# amplified to +-lr by the first-step normalization — the contract here is
# sharded == unsharded math, not Adam's sign sensitivity.
tx = optax.inject_hyperparams(lambda lr: optax.chain(
    optax.clip_by_global_norm(cfg.grad_clip_norm),
    optax.adamw(lr, eps=1e-4, weight_decay=cfg.weight_decay)))(lr=cfg.lr)
state = state.replace(opt_state=tx.init(state.params))
step = joint.make_joint_train_step(
    'resnet18', tx, cfg, spec, SpecAugmentConfig(enabled=False), num_heads=2)
r = np.random.default_rng(1)
batch = {'audio': r.standard_normal((4, 32000)).astype(np.float32) * 0.2,
         'label': np.array([0, 1, 2, 1], np.int32),
         'weight': np.ones(4, np.float32)}
rng = jax.random.PRNGKey(5)
ref_state, ref_m = jax.jit(step)(state, batch, rng)
mesh = sh.create_mesh(data_parallel=4, model_parallel=2)
def shard_heads(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh.head_sharded(mesh, np.ndim(x) or 1)),
        tree)
sharded = state.replace(
    params={'base': sh.replicate(mesh, state.params['base']),
            'heads': shard_heads(state.params['heads'])},
    batch_stats={'base': sh.replicate(mesh, state.batch_stats['base']),
                 'heads': shard_heads(state.batch_stats['heads'])},
    opt_state=sh.replicate(mesh, state.opt_state),
    param_mask=sh.replicate(mesh, state.param_mask),
    lr_scale=sh.replicate(mesh, state.lr_scale),
    step=sh.replicate(mesh, state.step))
new_state, m = jax.jit(step)(sharded, sh.shard_batch(mesh, batch), rng)
np.testing.assert_allclose(float(m['loss']), float(ref_m['loss']), rtol=1e-5)
got = jax.tree_util.tree_flatten(new_state.params)[0]
exp = jax.tree_util.tree_flatten(ref_state.params)[0]
for g, e in zip(got, exp):
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(e, np.float32),
                               rtol=1e-4, atol=2e-5)
print('SHARDED_JOINT_OK')
"""


@pytest.mark.slow
def test_joint_step_sharded_heads_matches_unsharded():
    """The joint step under a 4×2 ('data' × 'model') mesh — batch sharded
    over data, stacked heads sharded over model (expert-parallel training) —
    produces the same update as the single-device run (float tolerance; XLA
    inserts the base-gradient psum across both axes). Runs in a subprocess
    with its own 8-virtual-device CPU platform: in-process runs under the
    pytest harness hit an XLA:CPU runtime abort at result fetch that the
    identical standalone program does not (same isolation precedent as
    test_multichip_dryrun / the driver's dryrun re-exec)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _SHARDED_SELFTEST], env=env,
        capture_output=True, text=True, timeout=2400,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SHARDED_JOINT_OK" in out.stdout


def test_joint_eval_step_confusion_and_ensemble_acc(joint_setup):
    """Eval sufficient statistics agree with a host-side recomputation."""
    cfg, state, tx = joint_setup
    ev = jax.jit(joint.make_joint_eval_step("resnet18", SPEC64, num_heads=2))
    batch = _batch()
    stats = ev({"params": state.params, "batch_stats": state.batch_stats},
               batch)
    conf = np.asarray(stats["confusion"])
    assert conf.shape == (2, 2, 2)
    assert conf.sum() == pytest.approx(2 * batch["weight"].sum())
    assert float(stats["count"]) == pytest.approx(batch["weight"].sum())
    assert 0.0 <= float(stats["ens_correct"]) <= batch["weight"].sum()
    # per-head rows of the confusion match the binary label marginals
    y = np.asarray(joint.per_head_binary_labels(
        jnp.asarray(batch["label"]), 2))
    for h in range(2):
        np.testing.assert_allclose(conf[h].sum(axis=1),
                                   np.bincount(y[h], minlength=2))


# ---------------------------------------------------------------------------
# per_head_stages: per-head trailing backbone stages on a shared trunk
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def joint_phs_setup():
    cfg = TrainConfig(batch_size=2, lr=1e-3)
    state, tx = joint.init_joint_state(
        "resnet18", 2, jax.random.PRNGKey(0), cfg, (64, 64),
        per_head_stages=1,
    )
    return cfg, state, tx


def test_joint_per_head_stages_param_layout(joint_phs_setup):
    """'base' holds only the trunk (no layer4); 'heads' is {'tail','mlp'}
    with a leading num_heads axis on every leaf; head i's tail ∪ trunk is
    the full backbone key space."""
    _, state, _ = joint_phs_setup
    assert not any(k.startswith("layer4") for k in state.params["base"])
    assert set(state.params["heads"]) == {"tail", "mlp"}
    assert all(k.startswith("layer4") for k in state.params["heads"]["tail"])
    for leaf in jax.tree_util.tree_leaves(state.params["heads"]):
        assert leaf.shape[0] == 2
    # independent per-head tail inits (different RNG per head)
    k0 = np.asarray(state.params["heads"]["tail"]["layer4_0"]["conv1"]["kernel"])
    assert not np.array_equal(k0[0], k0[1])


def test_joint_per_head_stages_matches_loop_oracle(joint_phs_setup):
    """Grad equality: the vmapped trunk+tail formulation vs an explicit loop
    where each head applies the FULL backbone assembled from trunk ∪ its own
    tail (two independent formulations — the loop is literally N sequential
    single-head models sharing trunk values)."""
    cfg, state, tx = joint_phs_setup
    augment = SpecAugmentConfig(enabled=False)
    step = jax.jit(joint.make_joint_train_step(
        "resnet18", tx, cfg, SPEC64, augment, num_heads=2, per_head_stages=1,
    ))
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    _, metrics = step(state, batch, rng)

    from synthetic_audio_detection_tpu.models.head import BinaryHead
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    rng_mask, rng_drop = jax.random.split(rng)
    x = steps._features_from_waveforms(
        jnp.asarray(batch["audio"]), SPEC64, augment, rng_mask, 32_000
    )
    labels = jnp.asarray(batch["label"])
    weights = jnp.asarray(batch["weight"])
    drop_rngs = jax.random.split(rng_drop, 2)
    y_nb = joint.per_head_binary_labels(labels, 2)

    def loop_loss(params, stats, xx, ww, dtype):
        full = create_resnet("resnet18", 3, dtype, module_name="base")
        head = BinaryHead(dtype=dtype)
        losses = []
        for h in range(2):
            tail_h = jax.tree_util.tree_map(
                lambda a, h=h: a[h], params["heads"]["tail"])
            tail_hs = jax.tree_util.tree_map(
                lambda a, h=h: a[h], stats["heads"]["tail"])
            fparams = dict(params["base"], **tail_h)
            fstats = dict(stats["base"], **tail_hs)
            feats, _ = full.apply(
                {"params": fparams, "batch_stats": fstats},
                xx, train=True, mutable=["batch_stats"],
            )
            hp = jax.tree_util.tree_map(
                lambda a, h=h: a[h], params["heads"]["mlp"])
            hs = jax.tree_util.tree_map(
                lambda a, h=h: a[h], stats["heads"]["mlp"])
            out, _ = head.apply(
                {"params": hp, "batch_stats": hs}, feats, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rngs[h]},
            )
            losses.append(steps.cross_entropy(out, y_nb[h], ww))
        return jnp.stack(losses).mean()

    def vmap_loss(params, stats, xx, ww, dtype):
        trunk = create_resnet("resnet18", 3, dtype, module_name="base",
                              last_stage=3)
        feats, _ = trunk.apply(
            {"params": params["base"], "batch_stats": stats["base"]},
            xx, train=True, mutable=["batch_stats"],
        )
        tail = create_resnet("resnet18", 3, dtype, module_name="base",
                             first_stage=4)
        logits_nb, _ = joint._head_forward_train(
            BinaryHead(dtype=dtype), params["heads"], stats["heads"], feats,
            drop_rngs, tail=tail,
        )
        per_head = jax.vmap(steps.cross_entropy, in_axes=(0, 0, None))(
            logits_nb, y_nb, ww
        )
        return per_head.mean()

    # the jitted step's loss vs the f32 loop oracle (same dropout masks —
    # bernoulli draws change with the x64 flag, so this check must stay f32)
    loss_oracle = loop_loss(state.params, state.batch_stats, x, weights,
                            jnp.float32)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_oracle), rtol=1e-5
    )

    # grad equality between the two formulations runs in float64: they are
    # the same math in different accumulation orders (batched-vmap convs vs
    # sequential per-head convs), which in f32 diverges up to ~6e-3 relative
    # on near-cancelling trunk-grad elements; f64 keeps the oracle tight
    with jax.enable_x64():
        def to64(t):
            return jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                t,
            )

        x64 = jnp.asarray(x, jnp.float64)
        params64 = to64(state.params)
        stats64 = to64(state.batch_stats)
        w64 = jnp.asarray(weights, jnp.float64)

        loss_o64, grads_oracle = jax.value_and_grad(loop_loss)(
            params64, stats64, x64, w64, jnp.float64)
        loss_v64, grads_vmap = jax.value_and_grad(vmap_loss)(
            params64, stats64, x64, w64, jnp.float64)
        np.testing.assert_allclose(float(loss_v64), float(loss_o64),
                                   rtol=1e-12)
        flat_v, _ = jax.tree_util.tree_flatten(grads_vmap)
        flat_o, _ = jax.tree_util.tree_flatten(grads_oracle)
        for gv, go in zip(flat_v, flat_o):
            np.testing.assert_allclose(np.asarray(gv), np.asarray(go),
                                       rtol=1e-9, atol=1e-12)


def test_joint_per_head_stages_freeze_and_specialization(joint_phs_setup):
    """Phase 1: the trunk (stem + layers 1-3) is entirely frozen — every
    'base' leaf stays bit-identical — while BOTH per-head tails (layer4) and
    MLP heads move, and move differently across heads."""
    cfg, state, tx = joint_phs_setup
    step = jax.jit(joint.make_joint_train_step(
        "resnet18", tx, cfg, SPEC64, SpecAugmentConfig(enabled=False),
        num_heads=2, per_head_stages=1,
    ))
    new_state, _ = step(state, _batch(), jax.random.PRNGKey(3))
    for a, b in zip(jax.tree_util.tree_leaves(state.params["base"]),
                    jax.tree_util.tree_leaves(new_state.params["base"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dt = (np.asarray(new_state.params["heads"]["tail"]["layer4_0"]["conv1"]["kernel"])
          - np.asarray(state.params["heads"]["tail"]["layer4_0"]["conv1"]["kernel"]))
    assert np.abs(dt[0]).max() > 0 and np.abs(dt[1]).max() > 0
    assert not np.array_equal(dt[0], dt[1])
    dh = (np.asarray(new_state.params["heads"]["mlp"]["fc1"]["kernel"])
          - np.asarray(state.params["heads"]["mlp"]["fc1"]["kernel"]))
    assert np.abs(dh[0]).max() > 0 and np.abs(dh[1]).max() > 0
    # per-head tail BN stats updated independently
    s = np.asarray(
        new_state.batch_stats["heads"]["tail"]["layer4_0"]["bn1"]["mean"])
    assert s.shape[0] == 2 and not np.array_equal(s[0], s[1])


def test_joint_per_head_stages_stop_grad_at_seam(joint_phs_setup):
    """stop_grad_stage=4 (the phase-1 boundary) with per_head_stages=1 stops
    the gradient exactly at the trunk/tail seam: trunk grads are EXACT zeros
    (not merely masked), tail+mlp grads unchanged vs the unstopped step."""
    cfg, state, tx = joint_phs_setup
    from synthetic_audio_detection_tpu.models.head import BinaryHead
    from synthetic_audio_detection_tpu.models.resnet import create_resnet

    batch = _batch()
    rng = jax.random.PRNGKey(11)
    rng_mask, rng_drop = jax.random.split(rng)
    x = steps._features_from_waveforms(
        jnp.asarray(batch["audio"]), SPEC64, SpecAugmentConfig(enabled=False),
        rng_mask, 32_000)
    drop_rngs = jax.random.split(rng_drop, 2)
    y_nb = joint.per_head_binary_labels(jnp.asarray(batch["label"]), 2)
    weights = jnp.asarray(batch["weight"])

    def loss(params, sg):
        trunk = create_resnet("resnet18", 3, jnp.float32, module_name="base",
                              last_stage=3, stop_grad_stage=sg)
        feats, _ = trunk.apply(
            {"params": params["base"],
             "batch_stats": state.batch_stats["base"]},
            x, train=True, mutable=["batch_stats"])
        tail = create_resnet("resnet18", 3, jnp.float32, module_name="base",
                             first_stage=4, stop_grad_stage=sg)
        logits_nb, _ = joint._head_forward_train(
            BinaryHead(), params["heads"], state.batch_stats["heads"], feats,
            drop_rngs, tail=tail)
        return jax.vmap(steps.cross_entropy, in_axes=(0, 0, None))(
            logits_nb, y_nb, weights).mean()

    g_plain = jax.grad(lambda p: loss(p, 0))(state.params)
    g_sg = jax.grad(lambda p: loss(p, 4))(state.params)
    for leaf in jax.tree_util.tree_leaves(g_sg["base"]):
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.zeros_like(np.asarray(leaf)))
    for a, b in zip(jax.tree_util.tree_leaves(g_plain["heads"]),
                    jax.tree_util.tree_leaves(g_sg["heads"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_trainer_per_head_stages_end_to_end(tmp_path):
    """Tiny-corpus fit with per_head_stages=1 → merged artifact has DISTINCT
    per-head backbones (trunk shared, layer4 specialized — shared-backbone
    fast path correctly NOT detected), its forward agrees with the eval
    step's aggregation, and resume enforces the per_head_stages contract."""
    from synthetic_audio_detection_tpu.checkpoints import serialization
    from synthetic_audio_detection_tpu.train.joint import JointTrainer

    data_dir = _make_corpus(tmp_path)
    cfg = TrainConfig(
        data_dir=data_dir, batch_size=2, epochs=1, lr=1e-2, workers=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    t = JointTrainer(cfg, synthetic_classes=["SynA", "SynB"],
                     spec_cfg=SPEC64, use_mesh=False,
                     log_dir=str(tmp_path / "tb"), per_head_stages=1)
    t.fit()
    merged = tmp_path / "ck" / "joint_model.ckpt.merged.ckpt"
    assert merged.exists()
    ens = serialization.load_merged_native(str(merged))
    assert not ens.shared_backbone  # per-head layer4 ⇒ distinct backbones
    assert ens.shared_trunk_stages == 1  # …but the trunk IS shared
    assert ens.class_names == ["SynA", "SynB", "Real"]
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    out = np.asarray(jax.jit(lambda xx: ens(xx))(x))
    assert out.shape == (2, 3)

    # merged-artifact forward == per-sub-model full-backbone recomputation
    # pushed through the ensemble's aggregation contract
    from synthetic_audio_detection_tpu.ensemble import multihead
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier

    trunk_tail_logits = []
    for sub in multihead.unstack_variables(ens.variables, 2):
        m = BinaryClassifier(backbone="resnet18")
        trunk_tail_logits.append(np.asarray(m.apply(sub, x, train=False)))
    agg = multihead._aggregate(jnp.stack(trunk_tail_logits))
    np.testing.assert_allclose(out, np.asarray(agg), rtol=1e-5, atol=1e-5)

    # resume with mismatched per_head_stages is rejected
    final = str(tmp_path / "ck" / "final.ckpt")
    t.save_checkpoint(epoch=0, path=final)
    t_bad = JointTrainer(cfg, synthetic_classes=["SynA", "SynB"],
                         spec_cfg=SPEC64, use_mesh=False,
                         log_dir=str(tmp_path / "tb2"))
    with pytest.raises(ValueError, match="per_head_stages"):
        t_bad.resume(final)
    # and a matching trainer resumes exactly
    t2 = JointTrainer(cfg, synthetic_classes=["SynA", "SynB"],
                      spec_cfg=SPEC64, use_mesh=False,
                      log_dir=str(tmp_path / "tb3"), per_head_stages=1)
    t2.resume(final)
    for g, e in zip(jax.tree_util.tree_leaves(t2.state.params),
                    jax.tree_util.tree_leaves(t.state.params)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


# ---------------------------------------------------------------------------
# plain-OvR mode (hard_negatives=False): the reference's per-head data regime
# ---------------------------------------------------------------------------

def test_per_head_own_mask():
    labels = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)
    w = joint.per_head_own_mask(labels, num_heads=3, weights=None)
    expect = np.array(
        [
            [1, 1, 0, 0, 1],  # head 0 sees Real + class 1
            [1, 0, 1, 0, 0],  # head 1 sees Real + class 2
            [1, 0, 0, 1, 0],  # head 2 sees Real + class 3
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(w), expect)
    # pad mask composes in
    pad = jnp.asarray([1, 1, 1, 1, 0], jnp.float32)
    w = joint.per_head_own_mask(labels, num_heads=3, weights=pad)
    expect[:, 4] = 0
    np.testing.assert_array_equal(np.asarray(w), expect)


def test_joint_step_plain_ovr_ignores_foreign_rows(joint_setup):
    """Discriminating property: zeroing a FOREIGN row's weight must not move
    a head's loss in plain-OvR mode (the row was never in its loss), but
    must move it in hard-negative mode (the row is its negative). Forward
    logits are weight-independent, so loss equality is exact."""
    cfg, state, tx = joint_setup
    augment = SpecAugmentConfig(enabled=False)
    batch = _batch()  # labels [0, 1, 2, 1]; row 2 is foreign to head 0
    rng = jax.random.PRNGKey(7)
    dropped = dict(batch, weight=np.array([1, 1, 0, 1], np.float32))

    def losses(hard_negatives, b):
        step = jax.jit(joint.make_joint_train_step(
            "resnet18", tx, cfg, SPEC64, augment, num_heads=2,
            hard_negatives=hard_negatives,
        ))
        _, m = step(state, b, rng)
        return np.asarray(m["per_head_loss"], np.float64)

    ovr_full, ovr_drop = losses(False, batch), losses(False, dropped)
    hn_full, hn_drop = losses(True, batch), losses(True, dropped)
    # head 0 (class 1): row 2 foreign -> OvR loss unchanged, HN loss moves
    assert ovr_full[0] == ovr_drop[0]
    assert hn_full[0] != hn_drop[0]
    # head 1 (class 2): row 2 is its positive -> loss moves in both modes
    assert ovr_full[1] != ovr_drop[1]
    assert hn_full[1] != hn_drop[1]
    # and the two modes disagree on the full batch (hard negatives present)
    assert not np.allclose(ovr_full, hn_full)


def test_joint_eval_step_plain_ovr_statistics(joint_setup):
    """Eval confusion/loss in OvR mode count only each head's Real+own rows."""
    cfg, state, tx = joint_setup
    ev = jax.jit(joint.make_joint_eval_step(
        "resnet18", SPEC64, num_heads=2, hard_negatives=False))
    batch = _batch()  # labels [0, 1, 2, 1]
    stats = ev({"params": state.params, "batch_stats": state.batch_stats},
               batch)
    conf = np.asarray(stats["confusion"])
    # head 0: rows {0,1,3}; head 1: rows {0,2}
    assert conf[0].sum() == pytest.approx(3.0)
    assert conf[1].sum() == pytest.approx(2.0)
    # ensemble metrics stay whole-batch
    assert float(stats["count"]) == pytest.approx(4.0)
