"""Torch AdamW ↔ optax optimizer-state round trip (reference resume parity).

The reference's ``--resume`` restores the AdamW optimizer dict
(submodel_trainer.py:669-682, saved at :707-714). These tests pin our side of
that contract against REAL torch: run K AdamW steps in torch with seeded
synthetic gradients, save a reference-contract ``.pth``, resume our Trainer
from it, then apply step K+1 with the same gradient on both sides — the
resulting parameters must agree to float tolerance, which only happens if
exp_avg/exp_avg_sq/step all mapped correctly (fresh moments diverge hard on
step K+1 because the bias correction and second-moment scale differ).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from synthetic_audio_detection_tpu.checkpoints import torch_compat
from synthetic_audio_detection_tpu.train import steps
from synthetic_audio_detection_tpu.train.trainer import Trainer
from synthetic_audio_detection_tpu.utils.config import (
    SpectrogramConfig,
    TrainConfig,
)
from tests.torch_ref import TorchResNetFeatures, make_head

LR, WD, CLIP = 1e-3, 0.01, 0.5
K = 3  # torch steps before the checkpoint


def _trainer_style_torch_model():
    """Trainer-flavor module: unprefixed backbone keys + head.* (the timm
    model with ``.head`` assigned, submodel_trainer.py:606-633)."""
    torch.manual_seed(0)
    m = TorchResNetFeatures("resnet18")
    m.head = make_head(512)
    for p in m.parameters():
        p.requires_grad = False
    for mod in (m.layer4, m.head):
        for p in mod.parameters():
            p.requires_grad = True
    return m


def _grad_arrays(m, rng):
    """Seeded synthetic grads for the trainable params, keyed by torch name."""
    return {
        name: (rng.standard_normal(tuple(p.shape)) * 1e-3).astype(np.float32)
        for name, p in m.named_parameters() if p.requires_grad
    }


def _torch_step(m, opt, grads):
    for name, p in m.named_parameters():
        if p.requires_grad:
            p.grad = torch.tensor(grads[name])
    torch.nn.utils.clip_grad_norm_(m.parameters(), CLIP)
    opt.step()
    opt.zero_grad()


def _flax_grads(trainer, grads):
    """Torch-keyed grad arrays → full flax grad tree (zeros on frozen)."""
    partial = torch_compat.classifier_variables_from_torch(grads)["params"]
    zeros = jax.tree_util.tree_map(jnp.zeros_like, trainer.state.params)
    return torch_compat.overlay_tree(zeros, partial)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """K torch AdamW steps → reference trainer checkpoint contract on disk."""
    m = _trainer_style_torch_model()
    opt = torch.optim.AdamW(
        [p for p in m.parameters() if p.requires_grad], lr=LR, weight_decay=WD
    )
    rng = np.random.default_rng(7)
    grad_steps = [_grad_arrays(m, rng) for _ in range(K + 1)]
    for g in grad_steps[:K]:
        _torch_step(m, opt, g)
    path = tmp_path_factory.mktemp("optresume") / "model_best.pth"
    torch.save(
        {"epoch": 1, "state_dict": m.state_dict(), "best_acc": 0.5,
         "optimizer": opt.state_dict(), "scheduler": {},
         "total_steps": K},
        str(path),
    )
    return str(path), m, opt, grad_steps


def _make_trainer(resume_path):
    cfg = TrainConfig(lr=LR, weight_decay=WD, grad_clip_norm=CLIP,
                      resume=resume_path, batch_size=2)
    return Trainer(cfg, model_name="resnet18",
                   spec_cfg=SpectrogramConfig(out_size=64), use_mesh=False)


def test_moments_restored_exactly(torch_ckpt):
    path, m, opt, _ = torch_ckpt
    trainer = _make_trainer(path)
    adam = steps.extract_adam_state(trainer.state.opt_state)
    assert adam is not None
    count, mu, nu = adam
    assert count == K
    # spot-check one leaf against the torch dict, layout-transposed
    sd_opt = opt.state_dict()
    keys = torch_compat.trainable_param_keys(m.state_dict())
    idx = keys.index("layer4.0.conv1.weight")
    exp_avg = sd_opt["state"][idx]["exp_avg"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(mu["base"]["layer4_0"]["conv1"]["kernel"]), exp_avg
    )
    # frozen leaves carry zero moments
    assert float(np.abs(np.asarray(mu["base"]["conv1"]["kernel"])).max()) == 0.0


def test_step_k_plus_1_trajectory_matches_torch(torch_ckpt):
    path, m, opt, grad_steps = torch_ckpt
    trainer = _make_trainer(path)

    # ours: one masked optimizer update with the step-K+1 gradient
    grads = _flax_grads(trainer, grad_steps[K])
    mask = trainer.state.param_mask
    grads = jax.tree_util.tree_map(lambda g, mk: g * mk, grads, mask)
    opt_state = trainer.state.opt_state
    opt_state.hyperparams["lr"] = LR * trainer.state.lr_scale
    updates, _ = trainer.tx.update(grads, opt_state, trainer.state.params)
    updates = jax.tree_util.tree_map(lambda u, mk: u * mk, updates, mask)
    new_params = optax.apply_updates(trainer.state.params, updates)

    # torch: the same step on the model that kept training
    _torch_step(m, opt, grad_steps[K])
    torch_params = torch_compat.classifier_variables_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )["params"]

    flat_ours = jax.tree_util.tree_leaves_with_path(new_params)
    flat_torch = dict(jax.tree_util.tree_leaves_with_path(torch_params))
    assert len(flat_ours) == len(flat_torch)
    for kp, ours in flat_ours:
        theirs = flat_torch[kp]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_fresh_moments_would_diverge(torch_ckpt):
    """Control: without the moment import, step K+1 does NOT match — the test
    above is actually sensitive to the mapping."""
    path, m_orig, opt, grad_steps = torch_ckpt
    trainer = _make_trainer(path)
    fresh = trainer.tx.init(trainer.state.params)
    grads = _flax_grads(trainer, grad_steps[K])
    mask = trainer.state.param_mask
    grads = jax.tree_util.tree_map(lambda g, mk: g * mk, grads, mask)
    fresh.hyperparams["lr"] = LR * trainer.state.lr_scale
    updates, _ = trainer.tx.update(grads, fresh, trainer.state.params)
    updates = jax.tree_util.tree_map(lambda u, mk: u * mk, updates, mask)
    new_params = optax.apply_updates(trainer.state.params, updates)

    # compare against the properly-resumed trajectory leaf
    opt_state = trainer.state.opt_state
    opt_state.hyperparams["lr"] = LR * trainer.state.lr_scale
    upd2, _ = trainer.tx.update(grads, opt_state, trainer.state.params)
    upd2 = jax.tree_util.tree_map(lambda u, mk: u * mk, upd2, mask)
    good = optax.apply_updates(trainer.state.params, upd2)

    a = np.asarray(new_params["base"]["layer4_0"]["conv1"]["kernel"])
    b = np.asarray(good["base"]["layer4_0"]["conv1"]["kernel"])
    assert not np.allclose(a, b, rtol=1e-5, atol=1e-7)


def test_twin_export_roundtrip(tmp_path):
    """Our trainer → .pth twin (now with moments) → fresh trainer resume:
    Adam state identical, warning path gone."""
    cfg = TrainConfig(lr=LR, batch_size=2)
    t1 = Trainer(cfg, model_name="resnet18",
                 spec_cfg=SpectrogramConfig(out_size=64), use_mesh=False)
    # give the moments non-trivial values: two synthetic masked updates
    rng = np.random.default_rng(3)
    m = _trainer_style_torch_model()
    for _ in range(2):
        grads = _flax_grads(t1, _grad_arrays(m, rng))
        mask = t1.state.param_mask
        grads = jax.tree_util.tree_map(lambda g, mk: g * mk, grads, mask)
        t1.state.opt_state.hyperparams["lr"] = LR
        _, new_opt = t1.tx.update(grads, t1.state.opt_state, t1.state.params)
        t1.state = t1.state.replace(opt_state=new_opt,
                                    step=t1.state.step + 1)
    path = str(tmp_path / "ckpt")
    t1.save_checkpoint(epoch=0, path=path)

    cfg2 = TrainConfig(lr=LR, batch_size=2, resume=path + ".pth")
    t2 = Trainer(cfg2, model_name="resnet18",
                 spec_cfg=SpectrogramConfig(out_size=64), use_mesh=False)
    c1, mu1, nu1 = steps.extract_adam_state(t1.state.opt_state)
    c2, mu2, nu2 = steps.extract_adam_state(t2.state.opt_state)
    assert c1 == c2 == 2
    for a, b in zip(jax.tree_util.tree_leaves(mu1),
                    jax.tree_util.tree_leaves(mu2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(nu1),
                    jax.tree_util.tree_leaves(nu2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
