"""Multi-head ensemble as stacked parameters + vmap.

The reference's `ModularMultiHeadClassifier` loops N sub-models inside one
forward (reference: model_merger.py:75-91) — N sequential kernel launches. The
TPU-native formulation stacks the N sub-models' parameter trees along a
leading axis and `jax.vmap`s one sub-model forward over it: all heads become a
single XLA program with batched matmuls on the MXU (SURVEY.md §2.4
"ensemble-member parallel").

Aggregation rule (model_merger.py:75-91, whitepaper eqs. 5-6): output
[B, N+1] = [syn_1..syn_N, mean(real_1..real_N)], where per sub-model
index 0 = Real, index 1 = Synthetic.

When every sub-model shares identical backbone weights — which is exactly what
reference-merged checkpoints contain, because its `strict=False` load only
ever matches `head.*` keys (SURVEY.md §2.2, model_merger.py:55) — the backbone
runs once and only the tiny MLP heads are vmapped (`shared_backbone=True`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.models.classifier import (
    REAL_INDEX,
    SYNTHETIC_INDEX,
    BinaryClassifier,
)
from synthetic_audio_detection_tpu.models.head import BinaryHead


@dataclasses.dataclass
class MultiHeadEnsemble:
    """Stacked-parameter ensemble.

    variables: pytree whose leaves have a leading axis of size num_heads,
    matching BinaryClassifier's variable structure ({'params', 'batch_stats'}).
    class_names: [syn_1, ..., syn_N, real_name] (merged-checkpoint metadata
    contract, model_merger.py:153-159).

    head_mode: how independent-backbone heads execute — 'vmap' (all N in one
    batched program; N× activation memory) or 'map' (lax.map, sequential
    heads; constant memory — right for big batches × many heads). Ignored
    when shared_backbone (heads are tiny MLPs there).
    """

    model: BinaryClassifier
    variables: Any
    class_names: List[str]
    shared_backbone: bool = False
    head_mode: str = "vmap"
    # Trunk sharing: sub-models agree on every backbone stage EXCEPT the
    # trailing K (the joint trainer's per_head_stages=K artifacts,
    # train/joint.py). The shared trunk then runs once and only the per-head
    # tails + MLP heads are vmapped — N×-cheaper trunk without requiring
    # fully identical backbones. 0 = no trunk sharing detected.
    shared_trunk_stages: int = 0
    # Optional post-hoc calibration (utils/calibration.py): per-output-column
    # temperatures (+ optional operating threshold) fit on held-out data by
    # tools/calibrate_ensemble.py and carried in merged-checkpoint metadata.
    # None = the reference's raw-sigmoid behavior, bit-identical.
    calibration: Optional[Dict[str, Any]] = None
    # Generic Real-vs-any-synthetic head (train/joint.py generic_head): one
    # EXTRA stacked head beyond the named specialist classes, trained with
    # 'any synthetic class' as its positive. Its column (index N, between
    # the specialists and the real mean) never appears in the reference JSON
    # schema; serving uses it only for the Real/Synthetic verdict when
    # InferenceConfig.generic_verdict is set (infer/pipeline.py).
    generic_head: bool = False

    @property
    def num_heads(self) -> int:
        return len(self.class_names) - 1 + int(self.generic_head)

    @property
    def synthetic_names(self) -> List[str]:
        return self.class_names[:-1]

    @property
    def real_name(self) -> str:
        return self.class_names[-1]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ensemble_forward(self, x)


def stack_variables(variable_dicts: List[Any]) -> Any:
    """Stack N per-sub-model variable trees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *variable_dicts)


def unstack_variables(stacked: Any, num_heads: int) -> List[Any]:
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(num_heads)
    ]


def backbones_identical(variable_dicts: List[Any], atol: float = 0.0) -> bool:
    """True when every sub-model's `base` params + stats are bit-identical."""
    if len(variable_dicts) <= 1:
        return True

    def base_of(v):
        return {
            "params": v["params"]["base"],
            "batch_stats": v.get("batch_stats", {}).get("base", {}),
        }

    first = base_of(variable_dicts[0])
    flat0, _ = jax.tree_util.tree_flatten(first)
    for v in variable_dicts[1:]:
        flat, _ = jax.tree_util.tree_flatten(base_of(v))
        if len(flat) != len(flat0):
            return False
        for a, b in zip(flat0, flat):
            if a.shape != b.shape or not np.allclose(np.asarray(a), np.asarray(b), atol=atol):
                return False
    return True


def trunk_shared_stages(variable_dicts: List[Any], atol: float = 0.0) -> int:
    """Largest K such that every backbone leaf OUTSIDE the trailing K stages
    is bit-identical across sub-models (0 when even the stem/early stages
    differ, i.e. no trunk sharing). Stage count comes from the top-level
    `layer{k}_*` module names of the base subtree."""
    if len(variable_dicts) <= 1:
        return 0
    top_keys = set(variable_dicts[0]["params"]["base"].keys())
    n_stages = max(
        (int(k[len("layer"):].split("_")[0])
         for k in top_keys if k.startswith("layer")),
        default=0,
    )
    if n_stages < 2:
        return 0

    def subtree_equal(selector):
        def pick(v):
            return {
                "params": {k: x for k, x in v["params"]["base"].items()
                           if selector(k)},
                "batch_stats": {
                    k: x
                    for k, x in v.get("batch_stats", {}).get("base", {}).items()
                    if selector(k)
                },
            }

        flat0 = jax.tree_util.tree_leaves(pick(variable_dicts[0]))
        for v in variable_dicts[1:]:
            flat = jax.tree_util.tree_leaves(pick(v))
            if len(flat) != len(flat0):
                return False
            for a, b in zip(flat0, flat):
                if a.shape != b.shape or not np.allclose(
                    np.asarray(a), np.asarray(b), atol=atol
                ):
                    return False
        return True

    # try the smallest per-head suffix first (K=1: only the last stage
    # differs), growing until the remaining trunk matches
    for k in range(1, n_stages):
        trunk_stages = {f"layer{s}" for s in range(1, n_stages - k + 1)}

        def in_trunk(key, trunk_stages=trunk_stages):
            if not key.startswith("layer"):
                return True  # stem: conv1/bn1
            return key.split("_")[0] in trunk_stages

        if subtree_equal(in_trunk):
            return k
    return 0


def build_ensemble(
    model: BinaryClassifier,
    variable_dicts: List[Any],
    class_names: List[str],
    detect_shared_backbone: bool = True,
    generic_head: bool = False,
) -> MultiHeadEnsemble:
    if generic_head and len(variable_dicts) != len(class_names):
        raise ValueError(
            f"generic-head ensemble needs {len(class_names)} stacked heads "
            f"(specialists + generic), got {len(variable_dicts)}")
    shared = detect_shared_backbone and backbones_identical(variable_dicts)
    trunk_k = 0
    if not shared and detect_shared_backbone:
        trunk_k = trunk_shared_stages(variable_dicts)
    return MultiHeadEnsemble(
        model=model,
        variables=stack_variables(variable_dicts),
        class_names=list(class_names),
        shared_backbone=shared,
        shared_trunk_stages=trunk_k,
        generic_head=generic_head,
    )


def with_dtype(ens: MultiHeadEnsemble, dtype: Any) -> MultiHeadEnsemble:
    """Set the ensemble's COMPUTE dtype (params stay f32; flax casts at
    apply time). bf16 is required to reach the MXU's full rate — f32 convs
    run ~4x slower on TPU."""
    model = BinaryClassifier(
        backbone=ens.model.backbone,
        in_channels=ens.model.in_channels,
        num_outputs=ens.model.num_outputs,
        dtype=dtype,
    )
    return dataclasses.replace(ens, model=model)


def fold_to_mono(ens: MultiHeadEnsemble) -> MultiHeadEnsemble:
    """Exact stem transform: the serving input triplicates one spectrogram
    channel (reference `repeat(3,1,1)`, submodel_trainer.py:203), so summing
    conv1's kernel over its input-channel axis yields a 1-channel model with
    bit-identical outputs — 3× less stem bandwidth/compute on the TPU, where
    tiny channel counts pad poorly onto the MXU (models.resnet.fold_rgb_conv).
    Feed [B, H, W, 1] inputs to the returned ensemble."""
    variables = jax.tree_util.tree_map(lambda x: x, ens.variables)  # shallow copy
    params = dict(variables["params"])
    base = dict(params["base"])
    conv1 = dict(base["conv1"])
    conv1["kernel"] = conv1["kernel"].sum(axis=-2, keepdims=True)
    base["conv1"] = conv1
    params["base"] = base
    variables = {**variables, "params": params}
    model = BinaryClassifier(
        backbone=ens.model.backbone,
        in_channels=1,
        num_outputs=ens.model.num_outputs,
        dtype=ens.model.dtype,
        s2d_stage1=getattr(ens.model, "s2d_stage1", False),
    )
    return dataclasses.replace(ens, model=model, variables=variables)


def _aggregate(logits_nh: jnp.ndarray) -> jnp.ndarray:
    """[N, B, 2] per-head logits → [B, N+1] ensemble output.

    For a generic-head ensemble N counts the generic head too: column
    N_spec is the generic synthetic logit and the real mean (last column)
    includes the generic head's real logit — the generic head IS a
    real-vs-synthetic vote, so excluding it from the reference's mean
    (model_merger.py:75-91) would discard its evidence."""
    syn = jnp.transpose(logits_nh[:, :, SYNTHETIC_INDEX])  # [B, N]
    real_mean = jnp.mean(logits_nh[:, :, REAL_INDEX], axis=0, keepdims=True).T  # [B, 1]
    return jnp.concatenate([syn, real_mean], axis=1)


def ensemble_per_head_logits(ens: MultiHeadEnsemble, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, C] → PER-HEAD logits [N, B, 2] (pre-aggregation).

    Diagnostic surface: the reference's aggregation (model_merger.py:75-91)
    collapses per-head real logits into their mean, which makes one-vs-rest
    attribution confusions invisible (a foreign synthetic class can trigger
    several heads and the argmax rule picks the wrong attacker — measured in
    docs/PERFORMANCE.md's accuracy study). This exposes the raw per-head
    pairs so production debugging can see WHICH head fired."""
    if ens.shared_backbone:
        # one backbone pass + vmapped heads
        from synthetic_audio_detection_tpu.models.resnet import create_resnet

        base_vars = {
            "params": jax.tree_util.tree_map(lambda a: a[0], ens.variables["params"]["base"]),
            "batch_stats": jax.tree_util.tree_map(
                lambda a: a[0], ens.variables["batch_stats"]["base"]
            ),
        }
        resnet = create_resnet(
            ens.model.backbone, ens.model.in_channels, ens.model.dtype,
            s2d_stage1=getattr(ens.model, "s2d_stage1", False),
        )
        feats = resnet.apply(base_vars, x, train=False)
        head = BinaryHead(dtype=ens.model.dtype)
        head_vars = {
            "params": ens.variables["params"]["head"],
            "batch_stats": ens.variables["batch_stats"]["head"],
        }

        def head_fwd(hv, f):
            return head.apply(
                {"params": hv["params"], "batch_stats": hv["batch_stats"]}, f, train=False
            )

        logits_nh = jax.vmap(head_fwd, in_axes=(0, None))(head_vars, feats)  # [N, B, 2]
    elif ens.shared_trunk_stages:
        # shared trunk once + vmapped per-head trailing stages + MLP heads
        # (per_head_stages joint-trainer artifacts, train/joint.py)
        from synthetic_audio_detection_tpu.models.resnet import (
            RESNET_SPECS,
            create_resnet,
        )

        n_stages = len(RESNET_SPECS[ens.model.backbone][1])
        t_last = n_stages - ens.shared_trunk_stages

        def is_tail_key(k: str) -> bool:
            return (k.startswith("layer")
                    and int(k[len("layer"):].split("_")[0]) > t_last)

        def split(tree, want_tail):
            return {k: v for k, v in tree.items() if is_tail_key(k) is want_tail}

        trunk_vars = {
            "params": jax.tree_util.tree_map(
                lambda a: a[0], split(ens.variables["params"]["base"], False)
            ),
            "batch_stats": jax.tree_util.tree_map(
                lambda a: a[0],
                split(ens.variables["batch_stats"]["base"], False),
            ),
        }
        trunk = create_resnet(
            ens.model.backbone, ens.model.in_channels, ens.model.dtype,
            s2d_stage1=getattr(ens.model, "s2d_stage1", False),
            last_stage=t_last,
        )
        feats = trunk.apply(trunk_vars, x, train=False)
        tail = create_resnet(
            ens.model.backbone, ens.model.in_channels, ens.model.dtype,
            first_stage=t_last + 1,
        )
        head = BinaryHead(dtype=ens.model.dtype)
        tail_vars = {
            "params": split(ens.variables["params"]["base"], True),
            "batch_stats": split(ens.variables["batch_stats"]["base"], True),
        }
        head_vars = {
            "params": ens.variables["params"]["head"],
            "batch_stats": ens.variables["batch_stats"]["head"],
        }

        def tail_head_fwd(tv, hv, f):
            y = tail.apply(
                {"params": tv["params"], "batch_stats": tv["batch_stats"]},
                f, train=False,
            )
            return head.apply(
                {"params": hv["params"], "batch_stats": hv["batch_stats"]},
                y, train=False,
            )

        logits_nh = jax.vmap(tail_head_fwd, in_axes=(0, 0, None))(
            tail_vars, head_vars, feats
        )  # [N, B, 2]
    else:
        def sub_fwd(v, xx):
            return ens.model.apply(v, xx, train=False)

        if ens.head_mode == "map":
            # sequential heads: activation memory stays one-model-sized
            logits_nh = jax.lax.map(lambda v: sub_fwd(v, x), ens.variables)
        else:
            logits_nh = jax.vmap(sub_fwd, in_axes=(0, None))(ens.variables, x)
    return logits_nh


def ensemble_forward(ens: MultiHeadEnsemble, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, C] NHWC images → [B, N+1] logits. Jit-friendly."""
    return _aggregate(ensemble_per_head_logits(ens, x))


# ---------------------------------------------------------------------------
# Decision rule (inference_runner.py:194-214)
# ---------------------------------------------------------------------------

def decide(
    logits: jnp.ndarray, threshold: float = 0.5
) -> Dict[str, jnp.ndarray]:
    """Vectorized verdict over [B, N+1] ensemble logits.

    Returns probs [B, N+1] (elementwise sigmoid — NOT softmax, matching the
    reference), label_idx [B] in [0..N] where N denotes Real, and is_real [B].
    A clip is Real iff sigmoid(real_mean) >= threshold AND every synthetic
    sigmoid < threshold; otherwise the argmax synthetic head names it.
    """
    probs = jax.nn.sigmoid(logits)
    syn = probs[:, :-1]
    real = probs[:, -1]
    is_real = (real >= threshold) & jnp.all(syn < threshold, axis=1)
    syn_idx = jnp.argmax(syn, axis=1)
    n = logits.shape[1] - 1
    label_idx = jnp.where(is_real, n, syn_idx)
    return {"probs": probs, "label_idx": label_idx, "is_real": is_real}


def labels_from_indices(
    label_idx: np.ndarray, synthetic_names: List[str], real_name: str
) -> List[str]:
    n = len(synthetic_names)
    out = []
    for i in np.asarray(label_idx):
        i = int(i)
        if i == n:
            out.append(real_name)
        elif i < n:
            out.append(synthetic_names[i])
        else:  # unreachable, mirrors reference fallback naming
            out.append(f"Synthetic_{i + 1}")
    return out
