"""Joint multi-head ensemble training: all N heads in ONE jitted step.

The reference trains ensemble members one CLI invocation at a time, each with
its own full backbone, and its merger never actually transfers those backbones
(the strict=False load only matches ``head.*`` keys, model_merger.py:55 —
SURVEY.md §2.2), so the DEPLOYED reference ensemble is one shared backbone +
N trained MLP heads. This trainer produces that architecture directly, the
TPU-native way:

- ONE corpus pass per step: every head sees every batch. Per-head binary
  labels are derived from the corpus class index (head i's positive class is
  synthetic class i; everything else — Real AND the other generators — is its
  negative). This is exactly the hard-negative labeling that fixes ensemble
  attribution (``TrainConfig.hard_negative_classes``, measured 0.667 → 1.000
  in docs/PERFORMANCE.md), applied to all heads at once.
- ONE backbone forward/backward shared by all heads; the N MLP heads run as
  stacked parameters under ``jax.vmap`` (the same formulation the serving
  path uses, ensemble/multihead.py). Per-step cost is therefore ~one
  single-head step — training N heads sequentially pays the backbone N times
  for the same effective artifact.
- ``per_head_stages=K`` moves the share/specialize seam: the trailing K
  ResNet stages run per-head (stacked + vmapped) on top of a shared trunk.
  K=1 gives every head its own layer4 — the SAME specialization capacity a
  sequential per-head run has under the reference freeze schedule (only
  layer4+head train in phase 1, submodel_trainer.py:609-633), while the
  trunk below is still shared and its forward still runs once per batch.
  K=0 (default) is the fully-shared-backbone economy mode.
- The loss is the mean of the per-head CrossEntropy losses (multi-task).
  Adam's per-parameter normalization makes each head's trajectory invariant
  to that 1/N scale; the backbone sees the average of the head pulls.
- Freeze schedule, plateau-on-train-loss, NaN skip, grad clip, SpecAugment /
  RandomResizedCrop, stop-grad boundary, int16 transport, and the Pallas mel
  auto-gate are all inherited from the single-head step's semantics
  (train/steps.py; reference behaviors at submodel_trainer.py:241-313,
  646-660, 687-691).

The saved artifact is a merged ensemble checkpoint (native + reference
``.pth`` twin with ``sub_models.<i>.*`` keys, model_merger.py:153-159) whose
heads share one backbone bit-for-bit — so serving auto-detects the
shared-backbone fast path (ensemble/multihead.py:build_ensemble).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from dataclasses import field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from synthetic_audio_detection_tpu.audio import wavio
from synthetic_audio_detection_tpu.checkpoints import serialization
from synthetic_audio_detection_tpu.data import dataset as ds
from synthetic_audio_detection_tpu.ensemble import multihead
from synthetic_audio_detection_tpu.models.head import BinaryHead
from synthetic_audio_detection_tpu.models.resnet import RESNET_SPECS, create_resnet
from synthetic_audio_detection_tpu.parallel import sharding as sh
from synthetic_audio_detection_tpu.train import steps
from synthetic_audio_detection_tpu.train.plateau import PlateauState
from synthetic_audio_detection_tpu.utils import metrics as metrics_mod
from synthetic_audio_detection_tpu.utils.config import (
    SpecAugmentConfig,
    SpectrogramConfig,
    TrainConfig,
)
from synthetic_audio_detection_tpu.utils.tb_writer import SummaryWriter

log = logging.getLogger(__name__)


class JointTrainState(struct.PyTreeNode):
    """params/batch_stats trees are {'base': <backbone>, 'heads': <stacked>}
    where every 'heads' leaf has a leading num_heads axis."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    param_mask: Any  # 0/1 per leaf (1 = trainable)
    lr_scale: jnp.ndarray


def joint_freeze_mask(params: Any, phase2: bool) -> Any:
    """Backbone follows the reference freeze schedule (layer4, then +layer3
    at epochs//3 — submodel_trainer.py:609-633,687-691); heads are always
    trainable."""
    prefixes = steps.PHASE2_PREFIXES if phase2 else steps.PHASE1_PREFIXES
    base_mask = steps.freeze_mask(params["base"], prefixes)
    heads_mask = jax.tree_util.tree_map(
        lambda _: jnp.asarray(1.0, jnp.float32), params["heads"]
    )
    return {"base": base_mask, "heads": heads_mask}


def trunk_last_stage(model_name: str, per_head_stages: int) -> int:
    """1-based index of the last SHARED backbone stage."""
    n_stages = len(RESNET_SPECS[model_name][1])
    if not 0 <= per_head_stages < n_stages:
        raise ValueError(
            f"per_head_stages must be in [0, {n_stages - 1}], got {per_head_stages}"
        )
    return n_stages - per_head_stages


def init_joint_state(
    model_name: str,
    num_heads: int,
    rng: jax.Array,
    cfg: TrainConfig,
    input_hw: Tuple[int, int],
    dtype: Any = jnp.float32,
    per_head_stages: int = 0,
) -> Tuple[JointTrainState, optax.GradientTransformation]:
    """Backbone initialized once; each head initialized with its own RNG so
    the stacked heads start independent (like N separate trainer runs).

    With per_head_stages=K the trailing K ResNet stages are per-head: the
    'heads' subtree becomes {'tail': <stacked layer-stage params>, 'mlp':
    <stacked BinaryHead params>} and 'base' holds only the shared trunk."""
    t_last = trunk_last_stage(model_name, per_head_stages)
    base_rng, *head_rngs = jax.random.split(rng, num_heads + 1)
    base = create_resnet(model_name, 3, dtype, module_name="base",
                         last_stage=t_last)
    dummy = jnp.zeros((2, *input_hw, 3), jnp.float32)
    base_vars = base.init({"params": base_rng}, dummy, train=False)
    feats = base.apply(base_vars, dummy, train=False)
    head = BinaryHead(dtype=dtype)
    if per_head_stages == 0:
        head_vars = [head.init({"params": r}, feats, train=False) for r in head_rngs]
        stacked = multihead.stack_variables(head_vars)
        params = {"base": base_vars["params"], "heads": stacked["params"]}
        batch_stats = {
            "base": base_vars.get("batch_stats", {}),
            "heads": stacked.get("batch_stats", {}),
        }
    else:
        tail = create_resnet(model_name, 3, dtype, module_name="base",
                             first_stage=t_last + 1)
        tail_vars, mlp_vars = [], []
        for r in head_rngs:
            r_tail, r_mlp = jax.random.split(r)
            tv = tail.init({"params": r_tail}, feats, train=False)
            tail_vars.append(tv)
            tail_feats = tail.apply(tv, feats, train=False)
            mlp_vars.append(head.init({"params": r_mlp}, tail_feats, train=False))
        st_tail = multihead.stack_variables(tail_vars)
        st_mlp = multihead.stack_variables(mlp_vars)
        params = {
            "base": base_vars["params"],
            "heads": {"tail": st_tail["params"], "mlp": st_mlp["params"]},
        }
        batch_stats = {
            "base": base_vars.get("batch_stats", {}),
            "heads": {
                "tail": st_tail.get("batch_stats", {}),
                "mlp": st_mlp.get("batch_stats", {}),
            },
        }
    tx = steps.make_optimizer(cfg)
    state = JointTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        param_mask=joint_freeze_mask(params, phase2=False),
        lr_scale=jnp.ones((), jnp.float32),
    )
    return state, tx


def per_head_own_mask(
    labels: jnp.ndarray, num_heads: int, weights: Optional[jnp.ndarray],
    generic_head: bool = False,
) -> jnp.ndarray:
    """[N, B] 0/1: head i sees only Real and its own class — the reference's
    per-head data regime (each submodel_trainer run loads ONLY Class0+Class1
    folders, submodel_trainer.py:463-511), as a loss-level mask. Combined
    with the batch pad mask when present. NOTE: BN batch statistics still
    see every row (the joint trainer shares one forward); the loss masking
    removes the hard-negative LABEL pressure, which is the behavioral
    difference between the two recipes.

    With ``generic_head`` the LAST of ``num_heads`` heads is the generic
    Real-vs-any-synthetic head: every class is its own class, so its mask
    row is all-ones (times the pad mask)."""
    n_spec = num_heads - int(generic_head)
    heads = jnp.arange(1, n_spec + 1, dtype=labels.dtype)[:, None]
    own = (labels[None, :] == 0) | (labels[None, :] == heads)
    w = own.astype(jnp.float32)
    if generic_head:
        w = jnp.concatenate([w, jnp.ones((1, labels.shape[0]), jnp.float32)], 0)
    if weights is not None:
        w = w * weights.astype(jnp.float32)[None, :]
    return w


def per_head_binary_labels(
    labels: jnp.ndarray, num_heads: int, generic_head: bool = False
) -> jnp.ndarray:
    """Corpus label c ∈ {0=Real, 1..N=synthetic class i} → [N, B] binary
    targets: head i's positive (=1=SYNTHETIC_INDEX) iff c == i+1; Real and
    every OTHER generator are its negatives (the hard-negative contract,
    data/dataset.py:list_samples).

    With ``generic_head`` the LAST of ``num_heads`` heads is the generic
    detector (positive iff c != 0 — ANY synthetic class): its training
    signal rewards generator-agnostic artifact cues, the separability lever
    the LOGO study motivated (docs/PERFORMANCE.md: unseen-generator AUC is
    chance-level for specialist heads in both label regimes)."""
    n_spec = num_heads - int(generic_head)
    heads = jnp.arange(1, n_spec + 1, dtype=labels.dtype)[:, None]
    y = (labels[None, :] == heads).astype(jnp.int32)
    if generic_head:
        y = jnp.concatenate(
            [y, (labels[None, :] != 0).astype(jnp.int32)], axis=0)
    return y


def _head_forward_train(
    head: BinaryHead,
    head_params: Any,
    head_stats: Any,
    feats: jnp.ndarray,
    drop_rngs: jax.Array,
    tail: Any = None,
) -> Tuple[jnp.ndarray, Any]:
    """Vmapped over the stacked head axis → ([N, B, 2] logits, new stats).

    With a tail module (per_head_stages > 0) each head runs its own trailing
    backbone stages on the shared trunk features first; head_params/head_stats
    are then {'tail': ..., 'mlp': ...} stacked trees."""

    def one(hp, hs, r):
        x = feats
        if tail is not None:
            x, t_mut = tail.apply(
                {"params": hp["tail"], "batch_stats": hs["tail"]},
                x, train=True, mutable=["batch_stats"],
            )
        out, mutated = head.apply(
            {"params": hp["mlp"] if tail is not None else hp,
             "batch_stats": hs["mlp"] if tail is not None else hs},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": r},
        )
        if tail is not None:
            return out, {"tail": t_mut["batch_stats"],
                         "mlp": mutated["batch_stats"]}
        return out, mutated["batch_stats"]

    return jax.vmap(one)(head_params, head_stats, drop_rngs)


def make_joint_train_step(
    model_name: str,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    spec_cfg: SpectrogramConfig,
    augment: Optional[SpecAugmentConfig],
    num_heads: int,
    sample_rate: int = 32_000,
    stop_grad_stage: int = 0,
    dft_mode: Optional[str] = None,
    dtype: Any = jnp.float32,
    per_head_stages: int = 0,
    hard_negatives: bool = True,
    generic_head: bool = False,
) -> Callable:
    """joint_step(state, batch, rng) -> (state, metrics).

    generic_head=True marks the LAST of num_heads stacked heads as the
    generic Real-vs-any-synthetic detector (per_head_binary_labels): the
    caller supplies num_heads = n_specialists + 1 and the generic head
    shares the trunk/step machinery of every other head.

    hard_negatives=False restores the reference's plain-OvR regime via
    per_head_own_mask: each head's loss sees only Real + its own class
    (other generators neither positive nor negative for it).

    batch: {'audio': [B, T] (or int16 PCM transport), 'label': [B] int32 in
    0..N, optional 'weight': [B] 0/1 pad mask}. One XLA program: device mel →
    shared trunk fwd → vmapped per-head (tail+)head fwd → mean-CE bwd →
    masked AdamW → NaN skip (the same one-program contract as
    train/steps.py). stop_grad_stage is an ABSOLUTE stage index: each slice
    (trunk / per-head tail) applies it only if the boundary falls inside it,
    so the phase-1 boundary (stage 4) with per_head_stages=1 stops the
    gradient exactly at the trunk/tail seam and XLA DCEs the whole trunk
    backward."""

    head = BinaryHead(dtype=dtype)
    t_last = trunk_last_stage(model_name, per_head_stages)
    tail = (
        create_resnet(model_name, 3, dtype, module_name="base",
                      first_stage=t_last + 1,
                      stop_grad_stage=stop_grad_stage)
        if per_head_stages else None
    )

    def joint_step(state: JointTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng_mask, rng_drop = jax.random.split(rng)
        x = steps._features_from_waveforms(
            batch["audio"], spec_cfg, augment, rng_mask, sample_rate,
            dft_mode=dft_mode,
        )
        labels = batch["label"]
        weights = batch.get("weight")
        y_nb = per_head_binary_labels(labels, num_heads, generic_head)  # [N, B]
        w_nb = (None if hard_negatives
                else per_head_own_mask(labels, num_heads, weights,
                                       generic_head))
        drop_rngs = jax.random.split(rng_drop, num_heads)

        def loss_fn(params):
            base = create_resnet(model_name, 3, dtype, module_name="base",
                                 stop_grad_stage=stop_grad_stage,
                                 last_stage=t_last)
            feats, mutated = base.apply(
                {"params": params["base"],
                 "batch_stats": state.batch_stats["base"]},
                x, train=True, mutable=["batch_stats"],
            )
            logits_nb, new_head_stats = _head_forward_train(
                head, params["heads"], state.batch_stats["heads"], feats,
                drop_rngs, tail=tail,
            )
            if w_nb is None:
                per_head = jax.vmap(steps.cross_entropy, in_axes=(0, 0, None))(
                    logits_nb, y_nb, weights
                )  # [N]
            else:
                per_head = jax.vmap(steps.cross_entropy, in_axes=(0, 0, 0))(
                    logits_nb, y_nb, w_nb
                )  # [N]
            loss = per_head.mean()
            new_stats = {"base": mutated["batch_stats"], "heads": new_head_stats}
            return loss, (logits_nb, per_head, new_stats)

        (loss, (logits_nb, per_head_loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        mask = state.param_mask
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        opt_state = state.opt_state
        opt_state.hyperparams["lr"] = cfg.lr * state.lr_scale
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
        new_params = optax.apply_updates(state.params, updates)

        ok = jnp.isfinite(loss)

        def commit(_):
            return dataclasses.replace(
                state, step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt_state,
            )

        def skip(_):
            return dataclasses.replace(state, step=state.step + 1)

        new_state = jax.lax.cond(ok, commit, skip, None)
        correct = (jnp.argmax(logits_nb, -1) == y_nb).astype(jnp.float32)  # [N, B]
        if w_nb is not None:
            acc = (correct * w_nb).sum(1) / jnp.maximum(w_nb.sum(1), 1.0)
        elif weights is not None:
            w = weights.astype(jnp.float32)
            acc = (correct * w[None, :]).sum(1) / jnp.maximum(w.sum(), 1.0)
        else:
            acc = correct.mean(1)
        metrics = {
            "loss": loss,
            "per_head_loss": per_head_loss,
            "per_head_accuracy": acc,
            "accuracy": acc.mean(),
            "skipped": (~ok).astype(jnp.float32),
        }
        return new_state, metrics

    return joint_step


def make_joint_eval_step(
    model_name: str,
    spec_cfg: SpectrogramConfig,
    num_heads: int,
    sample_rate: int = 32_000,
    dft_mode: Optional[str] = None,
    dtype: Any = jnp.float32,
    per_head_stages: int = 0,
    hard_negatives: bool = True,
    generic_head: bool = False,
) -> Callable:
    """eval_step(state_vars, batch) → per-head sufficient statistics AND the
    ensemble verdict in one program: per-head [N,2,2] confusion, per-head
    sigmoid scores (for AUC/EER), and the aggregated [B, N+1] decision's
    attribution correctness (ensemble/multihead.py:_aggregate + decide — the
    quantity tools/accuracy_study.py measures offline).

    With ``generic_head`` the last head is the generic detector: ensemble
    attribution aggregates the SPECIALIST heads only (the generic head has
    no attribution meaning), and the detector score (AUC/EER basis) is the
    generic head's synthetic probability instead of 1 - sigmoid(real mean)
    — the quantity the LOGO A/B compares against the specialist rule."""

    head = BinaryHead(dtype=dtype)
    t_last = trunk_last_stage(model_name, per_head_stages)
    tail = (
        create_resnet(model_name, 3, dtype, module_name="base",
                      first_stage=t_last + 1)
        if per_head_stages else None
    )

    def eval_step(variables, batch):
        audio = batch["audio"]
        if jnp.issubdtype(audio.dtype, jnp.integer):
            audio = audio.astype(jnp.float32) / 32768.0
        x = steps._features_from_waveforms(
            audio, spec_cfg, None, None, sample_rate, dft_mode=dft_mode,
        )
        labels = batch["label"]
        weights = batch.get("weight")
        w = (weights if weights is not None
             else jnp.ones_like(labels)).astype(jnp.float32)
        base = create_resnet(model_name, 3, dtype, module_name="base",
                             last_stage=t_last)
        feats = base.apply(
            {"params": variables["params"]["base"],
             "batch_stats": variables["batch_stats"]["base"]},
            x, train=False,
        )

        def one(hp, hs):
            y = feats
            if tail is not None:
                y = tail.apply(
                    {"params": hp["tail"], "batch_stats": hs["tail"]},
                    y, train=False,
                )
            return head.apply(
                {"params": hp["mlp"] if tail is not None else hp,
                 "batch_stats": hs["mlp"] if tail is not None else hs},
                y, train=False,
            )

        logits_nb = jax.vmap(one)(
            variables["params"]["heads"], variables["batch_stats"]["heads"]
        )  # [N, B, 2]
        y_nb = per_head_binary_labels(labels, num_heads, generic_head)
        # per-head statistics over that head's OWN evaluation set: all rows
        # in hard-negative mode, only Real + its class in plain-OvR mode
        # (matching what each regime's loss optimizes)
        w_nb = (jnp.broadcast_to(w[None, :], y_nb.shape) if hard_negatives
                else per_head_own_mask(labels, num_heads, weights,
                                       generic_head))
        logp = jax.nn.log_softmax(logits_nb.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, y_nb[..., None], -1)[..., 0]  # [N, B]
        loss_sum = (nll * w_nb).sum(1)  # [N]
        pred = jnp.argmax(logits_nb, -1)  # [N, B]
        conf = jnp.zeros((num_heads, 2, 2), jnp.float32)
        head_idx = jnp.broadcast_to(
            jnp.arange(num_heads)[:, None], y_nb.shape
        )
        conf = conf.at[head_idx, y_nb, pred].add(w_nb)

        # ensemble verdict (aggregation + sigmoid-unanimity rule) over the
        # SPECIALIST heads; the generic head carries no attribution meaning
        n_spec = num_heads - int(generic_head)
        agg = multihead._aggregate(logits_nb[:n_spec])  # [B, n_spec+1]
        verdict = multihead.decide(agg)
        # corpus label 0 (Real) ↔ ensemble index n_spec; class i ↔ index i-1
        true_idx = jnp.where(labels == 0, n_spec, labels - 1)
        ens_correct = ((verdict["label_idx"] == true_idx).astype(jnp.float32) * w).sum()
        if generic_head:
            # detector score = the generic head's synthetic probability —
            # the separability quantity the generic head exists to improve
            det_score = jax.nn.softmax(
                logits_nb[-1].astype(jnp.float32), axis=-1
            )[:, multihead.SYNTHETIC_INDEX]
        else:
            # any-synthetic detector score = 1 - sigmoid(real_mean)
            det_score = 1.0 - jax.nn.sigmoid(agg[:, -1].astype(jnp.float32))
        return {
            "loss_sum": loss_sum,
            "confusion": conf,
            "count": w.sum(),
            "ens_correct": ens_correct,
            "det_score": det_score,
            "probs": jnp.exp(logp),
        }

    return eval_step


@dataclasses.dataclass
class JointEpochResult:
    train_loss: float = 0.0
    val_loss: float = 0.0
    per_head_acc: List[float] = field(default_factory=list)
    ensemble_acc: float = 0.0
    val_auc: Optional[float] = None
    val_eer: Optional[float] = None
    confusion: Optional[np.ndarray] = None  # [N, 2, 2]


class JointTrainer:
    """Ensemble-in-one-pass trainer. class layout: real_class is corpus label
    0; synthetic_classes[i] is corpus label i+1 and head i's positive."""

    def __init__(
        self,
        cfg: TrainConfig,
        synthetic_classes: List[str],
        real_class: str = "Real",
        model_name: str = "resnet18",
        spec_cfg: Optional[SpectrogramConfig] = None,
        augment: Optional[SpecAugmentConfig] = None,
        log_dir: Optional[str] = None,
        use_mesh: bool = True,
        per_head_stages: int = 0,
        hard_negatives: bool = True,
        generic_head: bool = False,
    ):
        if not synthetic_classes:
            raise ValueError("need at least one synthetic class")
        self.per_head_stages = per_head_stages
        self.hard_negatives = hard_negatives
        self.generic_head = generic_head
        self.cfg = cfg
        self.spec_cfg = spec_cfg or SpectrogramConfig.train()
        self.augment = augment or SpecAugmentConfig()
        self.real_class = real_class
        self.synthetic_classes = list(synthetic_classes)
        self.corpus_classes = [real_class] + self.synthetic_classes
        # merged-checkpoint metadata contract: [syn_1..syn_N, real]
        # (model_merger.py:153-159); the generic head is an EXTRA stacked
        # head beyond the named classes (its column never appears in the
        # reference JSON schema — ensemble/multihead.py generic_head)
        self.class_names = self.synthetic_classes + [real_class]
        self.num_heads = len(self.synthetic_classes) + int(generic_head)
        self.model_name = model_name
        self.dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else jnp.float32)

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state, self.tx = init_joint_state(
            model_name, self.num_heads, init_rng, cfg,
            self.spec_cfg.model_input_hw(), dtype=self.dtype,
            per_head_stages=per_head_stages,
        )
        self.plateau = PlateauState(cfg.plateau_factor, cfg.plateau_patience)
        self.best_acc = 0.0
        self.start_epoch = 0
        self.layer3_unfrozen = False
        self._transport = cfg.transport_dtype or (
            "int16"
            if cfg.compute_dtype == "bfloat16"
            and jax.default_backend() in ("tpu", "axon")
            else "float32"
        )
        self.mesh = sh.create_mesh() if use_mesh and jax.device_count() > 1 else None
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(make_joint_eval_step(
            model_name, self.spec_cfg, self.num_heads, dtype=self.dtype,
            dft_mode=self._dft_mode(), per_head_stages=per_head_stages,
            hard_negatives=hard_negatives, generic_head=generic_head,
        ))
        self.writer = SummaryWriter(
            log_dir or os.path.join("runs", f"joint_{int(time.time())}")
        )
        if cfg.resume:
            self.resume(cfg.resume)

    def _dft_mode(self) -> Optional[str]:
        dft = self.cfg.mel_dft or None
        if (dft is None and self.cfg.compute_dtype == "bfloat16"
                and jax.default_backend() in ("tpu", "axon")):
            dft = "pallas"  # same auto-gate as Trainer._build_train_step
        return dft

    def _build_train_step(self):
        stage = 0
        if self.cfg.stop_grad_boundary:
            stage = 3 if self.layer3_unfrozen else 4
        return jax.jit(
            make_joint_train_step(
                self.model_name, self.tx, self.cfg, self.spec_cfg,
                self.augment, self.num_heads,
                stop_grad_stage=stage, dft_mode=self._dft_mode(),
                dtype=self.dtype, per_head_stages=self.per_head_stages,
                hard_negatives=self.hard_negatives,
                generic_head=self.generic_head,
            ),
            donate_argnums=(0,),
        )

    # -- checkpointing ------------------------------------------------------

    def variables(self) -> Dict[str, Any]:
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    def to_ensemble(self) -> multihead.MultiHeadEnsemble:
        """Current state → serving-ready shared-backbone ensemble (the
        per-head dicts reference the SAME base arrays, so the shared-backbone
        detection is exact)."""
        v = jax.tree_util.tree_map(np.asarray, self.variables())
        per_head = []
        for i in range(self.num_heads):
            take_i = lambda a, i=i: a[i]
            if self.per_head_stages:
                # head i's full backbone = shared trunk ∪ its own trailing
                # stages (disjoint top-level module names — resnet.py stage
                # slicing keeps the full model's key space).
                base_params = dict(
                    v["params"]["base"],
                    **jax.tree_util.tree_map(take_i, v["params"]["heads"]["tail"]),
                )
                base_stats = dict(
                    v["batch_stats"]["base"],
                    **jax.tree_util.tree_map(
                        take_i, v["batch_stats"]["heads"]["tail"]
                    ),
                )
                head_params = jax.tree_util.tree_map(
                    take_i, v["params"]["heads"]["mlp"]
                )
                head_stats = jax.tree_util.tree_map(
                    take_i, v["batch_stats"]["heads"]["mlp"]
                )
            else:
                base_params = v["params"]["base"]
                base_stats = v["batch_stats"]["base"]
                head_params = jax.tree_util.tree_map(take_i, v["params"]["heads"])
                head_stats = jax.tree_util.tree_map(
                    take_i, v["batch_stats"]["heads"]
                )
            per_head.append({
                "params": {"base": base_params, "head": head_params},
                "batch_stats": {"base": base_stats, "head": head_stats},
            })
        from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier

        model = BinaryClassifier(backbone=self.model_name, dtype=self.dtype)
        return multihead.build_ensemble(model, per_head, self.class_names,
                                        generic_head=self.generic_head)

    def save_checkpoint(self, epoch: int, path: str) -> None:
        """Native resume checkpoint + merged serving artifacts: `<path>` is
        the trainer state; `<path>.merged.ckpt` / `<path>.merged.pth` are the
        ensemble in our native and the reference merged-model formats."""
        payload = {
            "variables": jax.tree_util.tree_map(np.asarray, self.variables()),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.state.opt_state),
        }
        meta = {
            "epoch": epoch,
            "best_acc": float(self.best_acc),
            "total_steps": int(self.state.step),
            "layer3_unfrozen": self.layer3_unfrozen,
            "scheduler": self.plateau.state_dict(),
            "model_name": self.model_name,
            "class_names": self.class_names,
            "num_heads": self.num_heads,
            "per_head_stages": self.per_head_stages,
            "generic_head": self.generic_head,
            "format": "sad-tpu-joint-v1",
        }
        serialization.save_native(path, payload, metadata=meta)
        ens = self.to_ensemble()
        serialization.save_merged_native(path + ".merged.ckpt", ens)
        serialization.save_merged_torch(path + ".merged.pth", ens)

    def resume(self, path: str) -> None:
        from flax import serialization as flax_ser

        tree, meta = serialization.load_native(path)
        if meta.get("format") != "sad-tpu-joint-v1":
            raise ValueError(f"{path}: not a joint-trainer checkpoint")
        ckpt_phs = int(meta.get("per_head_stages", 0))
        if ckpt_phs != self.per_head_stages:
            raise ValueError(
                f"{path}: checkpoint per_head_stages={ckpt_phs} but trainer "
                f"was built with per_head_stages={self.per_head_stages}"
            )
        ckpt_gen = bool(meta.get("generic_head", False))
        if ckpt_gen != self.generic_head:
            raise ValueError(
                f"{path}: checkpoint generic_head={ckpt_gen} but trainer "
                f"was built with generic_head={self.generic_head}"
            )
        self.state = self.state.replace(
            params=tree["variables"]["params"],
            batch_stats=tree["variables"]["batch_stats"],
            opt_state=flax_ser.from_state_dict(
                self.state.opt_state, tree["opt_state"]
            ),
            step=jnp.asarray(meta.get("total_steps", 0), jnp.int32),
        )
        self.plateau = PlateauState.from_state_dict(meta["scheduler"])
        self.state = self.state.replace(
            lr_scale=jnp.asarray(self.plateau.scale, jnp.float32)
        )
        self.best_acc = float(meta.get("best_acc", 0.0))
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        if meta.get("layer3_unfrozen"):
            self.state = self.state.replace(
                param_mask=joint_freeze_mask(self.state.params, phase2=True)
            )
            self.layer3_unfrozen = True
            self._train_step = self._build_train_step()
        log.info("resumed joint trainer at epoch %d", self.start_epoch)

    # -- epochs -------------------------------------------------------------

    def _batches(self, batcher: ds.WaveformBatcher, epoch: int, target_rows: int):
        for batch in batcher.epoch(epoch):
            if "weight" in batch:
                padded = batch
            else:
                padded, n = ds.pad_batch(batch, target_rows)
                padded["weight"] = (
                    np.arange(target_rows) < n
                ).astype(np.float32)
            if (self._transport == "int16"
                    and padded["audio"].dtype != np.int16):
                padded = dict(padded, audio=wavio.pcm16_quantize(padded["audio"]))
            if self.mesh is not None:
                padded = sh.shard_batch(self.mesh, padded)
            yield padded

    def train_epoch(self, batcher, epoch: int) -> Dict[str, float]:
        target_rows = 2 * batcher.batch_size
        loss_sum = jnp.float32(0.0)
        acc_sum = jnp.float32(0.0)
        n_good = jnp.float32(0.0)
        t0 = time.time()
        for i, batch in enumerate(self._batches(batcher, epoch, target_rows)):
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, m = self._train_step(self.state, batch, step_rng)
            good = jnp.isfinite(m["loss"]).astype(jnp.float32)
            loss_sum = loss_sum + jnp.where(good > 0, m["loss"], 0.0)
            acc_sum = acc_sum + good * m["accuracy"]
            n_good = n_good + good
            if (i + 1) % self.cfg.log_every_steps == 0:
                step = int(self.state.step)
                self.writer.add_scalar("train/loss", float(m["loss"]), step)
                self.writer.add_scalar("train/accuracy", float(m["accuracy"]), step)
                ph = np.asarray(m["per_head_loss"])
                for h, name in enumerate(self.synthetic_classes):
                    self.writer.add_scalar(f"train/loss_{name}", float(ph[h]), step)
                log.info(
                    "epoch %d step %d loss %.4f acc %.4f (%.1f rows/s)",
                    epoch, step, float(m["loss"]), float(m["accuracy"]),
                    (i + 1) * target_rows / (time.time() - t0),
                )
        denom = max(float(n_good), 1.0)
        return {"loss": float(loss_sum) / denom,
                "accuracy": float(acc_sum) / denom}

    def validate(self, batcher, epoch: int) -> JointEpochResult:
        target_rows = 2 * batcher.batch_size
        loss_sum = np.zeros(self.num_heads)
        confusion = np.zeros((self.num_heads, 2, 2))
        count = 0.0
        ens_correct = 0.0
        variables = self.variables()
        scores, is_syn = [], []
        for batch in self._batches(batcher, epoch, target_rows):
            stats = self._eval_step(variables, batch)
            loss_sum += np.asarray(stats["loss_sum"], np.float64)
            confusion += np.asarray(stats["confusion"], np.float64)
            count += float(stats["count"])
            ens_correct += float(stats["ens_correct"])
            valid = np.asarray(batch["weight"]) > 0
            scores.append(np.asarray(stats["det_score"], np.float32)[valid])
            is_syn.append(np.asarray(batch["label"])[valid] != 0)
        res = JointEpochResult()
        # normalize per head by ITS row count (== `count` in hard-negative
        # mode; the head's Real+own subset in plain-OvR mode)
        head_counts = confusion.sum(axis=(1, 2))
        res.val_loss = float(
            (loss_sum / np.maximum(head_counts, 1.0)).mean())
        res.per_head_acc = [
            float(np.trace(confusion[h]) / max(head_counts[h], 1.0))
            for h in range(self.num_heads)
        ]
        res.ensemble_acc = ens_correct / max(count, 1.0)
        res.confusion = confusion
        if scores:
            s, y = np.concatenate(scores), np.concatenate(is_syn)
            if 0 < y.sum() < y.size:
                res.val_auc = metrics_mod.roc_auc(s, y)
                res.val_eer = metrics_mod.equal_error_rate(s, y)[0]
        return res

    def fit(self, data_dir: Optional[str] = None) -> float:
        cfg = self.cfg
        data_dir = data_dir or cfg.data_dir
        train_samples = ds.list_samples(data_dir, "train", self.corpus_classes)
        val_samples = ds.list_samples(data_dir, "test", self.corpus_classes)
        make = ds.WaveformBatcher
        train_batcher = make(train_samples, cfg.batch_size, shuffle=True,
                             workers=cfg.workers, seed=cfg.seed)
        val_batcher = make(val_samples, cfg.batch_size, shuffle=False,
                           workers=cfg.workers)
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        unfreeze_epoch = int(cfg.epochs * cfg.unfreeze_layer3_at_fraction)

        for epoch in range(self.start_epoch, cfg.epochs):
            if (epoch >= unfreeze_epoch and not self.layer3_unfrozen
                    and not cfg.reference_quirk_frozen_layer3):
                self.state = self.state.replace(
                    param_mask=joint_freeze_mask(self.state.params, phase2=True)
                )
                self.layer3_unfrozen = True
                self._train_step = self._build_train_step()
                log.info("epoch %d: unfroze layer3 (epochs//3 schedule)", epoch)

            tr = self.train_epoch(train_batcher, epoch)
            scale = self.plateau.update(tr["loss"])
            self.state = self.state.replace(
                lr_scale=jnp.asarray(scale, jnp.float32)
            )
            res = self.validate(val_batcher, epoch)
            self.writer.add_scalar("epoch/train_loss", tr["loss"], epoch)
            self.writer.add_scalar("epoch/val_loss", res.val_loss, epoch)
            self.writer.add_scalar("epoch/ensemble_acc", res.ensemble_acc, epoch)
            if res.val_auc is not None:
                self.writer.add_scalar("epoch/val_auc", res.val_auc, epoch)
                self.writer.add_scalar("epoch/val_eer", res.val_eer, epoch)
            log.info(
                "epoch %d: train loss %.4f | val loss %.4f | ensemble acc %.4f"
                " | per-head %s | lr scale %.4f",
                epoch, tr["loss"], res.val_loss, res.ensemble_acc,
                ["%.3f" % a for a in res.per_head_acc], scale,
            )
            if res.val_auc is not None:
                log.info("epoch %d: detector AUC %.4f EER %.4f",
                         epoch, res.val_auc, res.val_eer)

            if res.ensemble_acc > self.best_acc:
                self.best_acc = res.ensemble_acc
                path = os.path.join(cfg.checkpoint_dir, "joint_model.ckpt")
                self.save_checkpoint(epoch, path)
                log.info("saved best joint checkpoint (ensemble acc %.4f) -> %s",
                         self.best_acc, path)
        return self.best_acc
