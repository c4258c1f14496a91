"""Training subsystem tests: plateau scheduler vs torch oracle, freeze masks,
NaN-skip, TB event file readability, metrics report vs sklearn."""

import io
import os
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.train.plateau import PlateauState
from synthetic_audio_detection_tpu.utils import metrics as M
from synthetic_audio_detection_tpu.utils.tb_writer import SummaryWriter, crc32c


def test_plateau_matches_torch():
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2
    )
    ours = PlateauState(factor=0.5, patience=2)
    rng = np.random.default_rng(0)
    vals = [1.0, 0.9, 0.95, 0.96, 0.97, 0.98, 0.5, 0.55, 0.56, 0.57, 0.58]
    vals += list(rng.uniform(0.4, 0.6, 20))
    for v in vals:
        sch.step(float(v))
        scale = ours.update(float(v))
        torch_lr = opt.param_groups[0]["lr"]
        assert scale == pytest.approx(torch_lr), (v, scale, torch_lr)


def test_freeze_mask_prefixes():
    from synthetic_audio_detection_tpu.train import steps

    params = {
        "base": {
            "conv1": {"kernel": jnp.zeros(1)},
            "layer3_0": {"conv1": {"kernel": jnp.zeros(1)}},
            "layer4_1": {"bn2": {"scale": jnp.zeros(1)}},
        },
        "head": {"fc1": {"kernel": jnp.zeros(1)}},
    }
    m1 = steps.freeze_mask(params, steps.PHASE1_PREFIXES)
    assert float(m1["base"]["conv1"]["kernel"]) == 0.0
    assert float(m1["base"]["layer3_0"]["conv1"]["kernel"]) == 0.0
    assert float(m1["base"]["layer4_1"]["bn2"]["scale"]) == 1.0
    assert float(m1["head"]["fc1"]["kernel"]) == 1.0
    m2 = steps.freeze_mask(params, steps.PHASE2_PREFIXES)
    assert float(m2["base"]["layer3_0"]["conv1"]["kernel"]) == 1.0


@pytest.fixture(scope="module")
def tiny_train_setup():
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=2, lr=1e-3)
    spec = SpectrogramConfig(out_size=64)
    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(model, jax.random.PRNGKey(0), cfg,
                                         input_size=64)
    step = jax.jit(steps.make_train_step(model, tx, cfg, spec,
                                         SpecAugmentConfig()))
    return state, step


def _batch(nan=False):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((4, 32000)).astype(np.float32) * 0.2
    if nan:
        audio[0, 0] = np.nan
    return {
        "audio": audio,
        "label": np.array([0, 1, 0, 1], np.int32),
        "weight": np.ones(4, np.float32),
    }


def test_train_step_updates_only_trainable(tiny_train_setup):
    state, step = tiny_train_setup
    new_state, m = step(state, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert float(m["skipped"]) == 0.0
    # frozen stem unchanged, trainable layer4/head changed
    p0, p1 = state.params, new_state.params
    np.testing.assert_array_equal(
        p0["base"]["conv1"]["kernel"], p1["base"]["conv1"]["kernel"]
    )
    assert not np.allclose(
        p0["head"]["fc1"]["kernel"], p1["head"]["fc1"]["kernel"]
    )
    assert not np.allclose(
        p0["base"]["layer4_0"]["conv1"]["kernel"],
        p1["base"]["layer4_0"]["conv1"]["kernel"],
    )
    assert np.allclose(
        p0["base"]["layer1_0"]["conv1"]["kernel"],
        p1["base"]["layer1_0"]["conv1"]["kernel"],
    )
    assert int(new_state.step) == int(state.step) + 1


def test_nan_batch_skips_update(tiny_train_setup):
    state, step = tiny_train_setup
    new_state, m = step(state, _batch(nan=True), jax.random.PRNGKey(2))
    assert float(m["skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step) + 1  # step still counts


def test_metrics_report_matches_sklearn(rng):
    from sklearn.metrics import classification_report

    y_true = rng.integers(0, 2, 200)
    y_pred = rng.integers(0, 2, 200)
    conf = np.zeros((2, 2))
    np.add.at(conf, (y_true, y_pred), 1)
    ours = M.report_from_confusion(conf, ["Real", "Syn"])
    ref = classification_report(
        y_true, y_pred, target_names=["Real", "Syn"], output_dict=True,
        zero_division=0,
    )
    for cls in ("Real", "Syn", "macro avg", "weighted avg"):
        for k in ("precision", "recall", "f1-score", "support"):
            assert ours[cls][k] == pytest.approx(ref[cls][k]), (cls, k)
    assert ours["accuracy"]["f1-score"] == pytest.approx(ref["accuracy"])


def _read_tfrecords(path):
    """Parse TFRecord framing back, verifying CRCs."""
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        payload = data[pos + 12 : pos + 12 + length]
        (payload_crc,) = struct.unpack_from("<I", data, pos + 12 + length)
        header = data[pos : pos + 8]
        crc = crc32c(header)
        masked = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked == len_crc, "length CRC mismatch"
        crc = crc32c(payload)
        masked = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked == payload_crc, "payload CRC mismatch"
        records.append(payload)
        pos += 12 + length + 4
    return records


def test_tb_writer_produces_valid_tfrecords(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 100)
    w.add_scalar("train/accuracy", 0.9, 100)
    w.close()
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")
    records = _read_tfrecords(os.path.join(tmp_path, files[0]))
    assert len(records) == 3  # file_version + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    # float 0.5 little-endian inside the scalar record
    assert struct.pack("<f", 0.5) in records[1]
    assert b"train/accuracy" in records[2]


def test_tb_events_readable_by_tensorboard_if_available(tmp_path):
    """If the tensorboard package exists, its own loader must parse our file."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader,
        )
        from tensorboard.compat.proto import event_pb2
    except Exception:
        pytest.skip("tensorboard not installed")
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.25, 7)
    w.close()
    f = os.path.join(tmp_path, os.listdir(tmp_path)[0])
    events = [event_pb2.Event.FromString(r) for r in RawEventFileLoader(f).Load()]
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 7
    assert events[1].summary.value[0].tag == "x"
    assert events[1].summary.value[0].simple_value == 1.25


def test_reference_quirk_loss_semantics(tiny_train_setup):
    """SURVEY.md §2.2: with the reference's head-not-in-loss quirk, CE is
    computed over pooled backbone features; the head receives NO updates
    (torch skips grad-None params, including AdamW decay)."""
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=2, lr=1e-3)
    spec = SpectrogramConfig(out_size=64)
    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(model, jax.random.PRNGKey(0), cfg,
                                         input_size=64)
    step = jax.jit(steps.make_train_step(
        model, tx, cfg, spec, SpecAugmentConfig(), reference_quirk_loss=True))
    new_state, m = step(state, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["fc1"]["kernel"]),
        np.asarray(new_state.params["head"]["fc1"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(state.params["base"]["layer4_0"]["conv1"]["kernel"]),
        np.asarray(new_state.params["base"]["layer4_0"]["conv1"]["kernel"]),
    )


def test_plateau_from_torch_state_dict():
    """Resuming from a reference torch checkpoint's scheduler dict
    (submodel_trainer.py:676) must continue the exact torch LR trajectory."""
    import torch

    base_lr = 0.1
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2
    )
    for v in [1.0, 1.1, 1.2, 1.3, 1.25]:  # triggers one reduction
        sch.step(v)
    ours = PlateauState.from_torch_state_dict(sch.state_dict(), base_lr=base_lr)
    assert ours.scale == pytest.approx(opt.param_groups[0]["lr"] / base_lr)
    assert ours.scale < 1.0
    for v in [1.2, 1.2, 1.2, 1.2, 0.5, 0.6, 0.6, 0.6, 0.6]:
        sch.step(float(v))
        scale = ours.update(float(v))
        assert scale == pytest.approx(opt.param_groups[0]["lr"] / base_lr), v


def test_resume_starts_at_saved_epoch_plus_one(tmp_path):
    """submodel_trainer.py:677: start_epoch = checkpoint['epoch'] + 1 — the
    saved (best) epoch already completed and must not be re-trained. Holds
    for both the native and the torch-twin checkpoint."""
    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=2, lr=1e-3, checkpoint_dir=str(tmp_path))
    spec = SpectrogramConfig(out_size=64)
    t = Trainer(cfg, spec_cfg=spec, use_mesh=False, log_dir=str(tmp_path / "tb"))
    t.best_acc = 0.75
    t.plateau.update(1.0)
    path = str(tmp_path / "best_model.ckpt")
    t.save_checkpoint(3, path)

    t2 = Trainer(cfg, spec_cfg=spec, use_mesh=False, log_dir=str(tmp_path / "tb2"))
    t2.resume(path)
    assert t2.start_epoch == 4
    assert t2.best_acc == pytest.approx(0.75)
    assert t2.plateau.best == pytest.approx(1.0)

    t3 = Trainer(cfg, spec_cfg=spec, use_mesh=False, log_dir=str(tmp_path / "tb3"))
    t3.resume(path + ".pth")
    assert t3.start_epoch == 4
    assert t3.best_acc == pytest.approx(0.75)


def test_producer_exception_propagates_not_deadlocks():
    """A failing batch builder must surface its exception to the consumer
    instead of dying before the queue sentinel (which hangs the epoch)."""
    import signal

    from synthetic_audio_detection_tpu.data import dataset as ds

    b = ds.WaveformBatcher(
        [("nope.wav", 0)] * 4, batch_size=2, shuffle=False, workers=1
    )

    def boom(chunk, ex):
        raise RuntimeError("boom in producer")

    b._make_batch = boom
    signal.alarm(60)  # hard backstop: a regression here deadlocks
    try:
        with pytest.raises(RuntimeError, match="boom in producer"):
            list(b.epoch(0))
    finally:
        signal.alarm(0)


def test_torch_twin_restores_scheduler_and_freeze_state(tmp_path):
    """The .pth twin must carry the plateau state and the layer3 flag so a
    torch-twin resume keeps the LR trajectory and stays unfrozen (review
    findings r2: scheduler={} silently reset the LR schedule, and a resume
    past the unfreeze boundary never unfroze layer3)."""
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=2, lr=1e-2, checkpoint_dir=str(tmp_path))
    spec = SpectrogramConfig(out_size=64)
    t = Trainer(cfg, spec_cfg=spec, use_mesh=False, log_dir=str(tmp_path / "tb"))
    # drive the plateau into a reduced-LR regime and unfreeze layer3
    for v in [1.0, 1.1, 1.1, 1.1, 1.1]:
        t.plateau.update(v)
    assert t.plateau.scale < 1.0
    t.state = steps.unfreeze_layer3(t.state)
    t.layer3_unfrozen = True
    path = str(tmp_path / "ckpt")
    t.save_checkpoint(5, path)

    t2 = Trainer(cfg, spec_cfg=spec, use_mesh=False, log_dir=str(tmp_path / "tb2"))
    t2.resume(path + ".pth")
    assert t2.start_epoch == 6
    assert t2.plateau.scale == pytest.approx(t.plateau.scale)
    assert t2.plateau.num_bad_epochs == t.plateau.num_bad_epochs
    assert t2.layer3_unfrozen is True
    assert float(t2.state.lr_scale) == pytest.approx(t.plateau.scale)


def test_epoch_mean_feeds_scheduler_not_sampled_loss():
    """train_epoch's reported loss must be the FULL-epoch mean (what the
    reference scheduler consumes), not the every-log_every_steps sample."""
    import types

    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=1, log_every_steps=100)
    t = Trainer.__new__(Trainer)  # skip heavy init; drive train_epoch directly
    t.cfg = cfg
    t.mesh = None
    t._transport = "float32"  # __init__ invariant the minimal Trainer needs
    t.rng = jax.random.PRNGKey(0)
    t.writer = types.SimpleNamespace(add_scalar=lambda *a, **k: None)
    t.state = types.SimpleNamespace(step=0, lr_scale=1.0)

    losses = iter([1.0, 2.0, 3.0, float("nan")])  # nan batch must be excluded

    def fake_step(state, batch, rng):
        v = next(losses)
        return state, {"loss": jnp.float32(v), "accuracy": jnp.float32(1.0)}

    t._train_step = fake_step

    class FakeBatcher:
        batch_size = 1

        def epoch(self, _):
            for _ in range(4):
                yield {"audio": np.zeros((2, 10), np.float32),
                       "label": np.zeros(2, np.int32),
                       "weight": np.ones(2, np.float32)}

    out = t.train_epoch(FakeBatcher(), 0)
    assert out["loss"] == pytest.approx(2.0)  # mean of 1,2,3; nan excluded


def test_bf16_compute_train_step_keeps_f32_state():
    """--bf16 trains with bfloat16 compute but float32 params/opt/loss
    (mixed precision; the reference's reduced-precision precedent is legacy
    inference AMP, inference_script.py:278)."""
    import jax.numpy as jnp

    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        SpectrogramConfig,
        TrainConfig,
    )

    cfg = TrainConfig(batch_size=2, lr=1e-3, compute_dtype="bfloat16")
    model = BinaryClassifier(backbone="resnet18", dtype=jnp.bfloat16)
    state, tx = steps.create_train_state(model, jax.random.PRNGKey(0), cfg,
                                         input_size=64)
    step = jax.jit(steps.make_train_step(
        model, tx, cfg, SpectrogramConfig(out_size=64), SpecAugmentConfig(),
        stop_grad_stage=4))
    new_state, m = step(state, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    old = np.asarray(jax.tree_util.tree_leaves(state.params["head"])[0])
    new = np.asarray(jax.tree_util.tree_leaves(new_state.params["head"])[0])
    assert not np.allclose(old, new)


def test_reference_quirk_frozen_layer3(tmp_path):
    """Reference quirk (verified round 3): its AdamW is constructed over the
    phase-1 filter BEFORE the epoch loop (submodel_trainer.py:647-651), so
    the epochs//3 layer3 'unfreeze' (:687-691) sets requires_grad on params
    the optimizer does not hold — layer3 weights never change in the
    reference. With reference_quirk_frozen_layer3 the transition is skipped
    entirely; default behavior trains layer3 (the documented intent)."""
    import dataclasses as dc

    from synthetic_audio_detection_tpu.audio import wavio
    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cls in ("Real", "Syn"):
            d = tmp_path / "data" / split / cls
            d.mkdir(parents=True)
            for i in range(2):
                y = (rng.standard_normal(128_000) * 0.2).astype(np.float32)
                wavio.write_wav(str(d / f"{cls}_{i}.wav"), y[None, :], 32_000)

    base_cfg = TrainConfig(
        data_dir=str(tmp_path / "data"), batch_size=2, epochs=2, lr=1e-2,
        workers=2, checkpoint_dir=str(tmp_path / "ck"), class1="Syn",
    )
    spec = SpectrogramConfig(out_size=64)

    quirk = Trainer(dc.replace(base_cfg,
                               reference_quirk_frozen_layer3=True),
                    spec_cfg=spec, use_mesh=False,
                    log_dir=str(tmp_path / "tb1"))
    l3_init = np.asarray(
        quirk.state.params["base"]["layer3_0"]["conv1"]["kernel"])
    quirk.fit()
    assert not quirk.layer3_unfrozen
    np.testing.assert_array_equal(
        np.asarray(quirk.state.params["base"]["layer3_0"]["conv1"]["kernel"]),
        l3_init)

    sane = Trainer(base_cfg, spec_cfg=spec, use_mesh=False,
                   log_dir=str(tmp_path / "tb2"))
    l3_init2 = np.asarray(
        sane.state.params["base"]["layer3_0"]["conv1"]["kernel"])
    sane.fit()
    assert sane.layer3_unfrozen
    assert not np.array_equal(
        np.asarray(sane.state.params["base"]["layer3_0"]["conv1"]["kernel"]),
        l3_init2)


def test_list_samples_hard_negative_classes(tmp_path):
    """extra_negative_classes folds other generators' folders into label 0
    (the attribution hard-negative recipe, docs/PERFORMANCE.md) without
    disturbing the per-class labels the legacy N-class trainer relies on."""
    from synthetic_audio_detection_tpu.data import dataset as ds

    for cls in ("Real", "SynthA", "SynthB"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(2):
            (d / f"{cls.lower()}_{i}.wav").write_bytes(b"")

    plain = ds.list_samples(str(tmp_path), "train", ["Real", "SynthA"])
    assert [lb for _, lb in plain] == [0, 0, 1, 1]

    hn = ds.list_samples(str(tmp_path), "train", ["Real", "SynthA"],
                         extra_negative_classes=["SynthB"])
    assert [lb for _, lb in hn] == [0, 0, 1, 1, 0, 0]
    assert all("SynthB" in p for p, lb in hn[4:])

    # N-class enumeration unchanged (legacy trainer contract)
    nclass = ds.list_samples(str(tmp_path), "train",
                             ["Real", "SynthA", "SynthB"])
    assert [lb for _, lb in nclass] == [0, 0, 1, 1, 2, 2]

    with pytest.raises(FileNotFoundError):
        ds.list_samples(str(tmp_path), "train", ["Real", "SynthA"],
                        extra_negative_classes=["Nope"])


def test_epoch_seed_derivation_decorrelated():
    """Shuffle seeds come from the splitmix64 finalizer, not seed+epoch:
    distinct (seed, epoch) pairs must not collide the way additive seeding
    does (seed=1,epoch=2 vs seed=2,epoch=1)."""
    from synthetic_audio_detection_tpu.data.dataset import derive_epoch_seed

    seen = {derive_epoch_seed(s, e) for s in range(8) for e in range(8)}
    assert len(seen) == 64  # additive seeding would give 15


def test_int16_transport_features_exact():
    """Integer batches are int16 PCM transport: the jitted step dequantizes
    to i/32768 on device (train/steps.py:_features_from_waveforms), so for
    PCM-grid waveforms — the post-ETL segment contract — the features are
    BIT-identical to float32 transport. Mirrors the serving path's transport
    (infer/pipeline.py int16 windows)."""
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import SpectrogramConfig

    rng = np.random.default_rng(3)
    ints = rng.integers(-32768, 32768, size=(2, 32000), dtype=np.int16)
    f32 = ints.astype(np.float32) / 32768.0
    spec = SpectrogramConfig(out_size=64)
    a = steps._features_from_waveforms(jnp.asarray(ints), spec, None, None,
                                       32000)
    b = steps._features_from_waveforms(jnp.asarray(f32), spec, None, None,
                                       32000)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_int16_transport_quantizes_batches(tmp_path):
    """transport_dtype='int16' makes _batches emit int16 audio (quantized
    round(x*32768), exact for PCM-grid floats); the default stays float32
    off-TPU (auto gate = bf16 + TPU backend, utils/config.py)."""
    from synthetic_audio_detection_tpu.train.trainer import Trainer
    from synthetic_audio_detection_tpu.utils.config import (
        SpectrogramConfig,
        TrainConfig,
    )

    spec = SpectrogramConfig(out_size=64)
    cfg = TrainConfig(batch_size=2, lr=1e-3, transport_dtype="int16")
    t = Trainer(cfg, spec_cfg=spec, use_mesh=False,
                log_dir=str(tmp_path / "tb"))
    assert t._transport == "int16"

    ints = np.random.default_rng(5).integers(
        -32768, 32768, size=(4, 32000), dtype=np.int16)

    class OneBatch:
        batch_size = 2

        def epoch(self, epoch_idx=0):
            yield {"audio": ints.astype(np.float32) / 32768.0,
                   "label": np.array([0, 1, 0, 1], np.int32)}

    (got,) = list(t._batches(OneBatch(), 0, target_rows=4))
    assert got["audio"].dtype == np.int16
    np.testing.assert_array_equal(got["audio"], ints)

    # default off-TPU: float32 (the auto gate needs bf16 + tpu/axon backend)
    t2 = Trainer(TrainConfig(batch_size=2, lr=1e-3), spec_cfg=spec,
                 use_mesh=False, log_dir=str(tmp_path / "tb2"))
    assert t2._transport == "float32"
