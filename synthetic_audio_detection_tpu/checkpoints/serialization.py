"""Native checkpoint save/load + the reference checkpoint contracts.

Two persistence layers:

- **Native format**: msgpack (flax.serialization) with a JSON sidecar for
  metadata — fast, dependency-light, and safe to load (no pickle). Used for
  our own training state and merged ensembles.
- **Torch compat**: readers/writers for the reference's ``.pth`` contracts via
  checkpoints.torch_pickle + checkpoints.torch_compat, so existing reference
  checkpoints round-trip (BASELINE.json requirement):

  * sub-model trainer checkpoint: ``{epoch, state_dict, best_acc, optimizer,
    scheduler, total_steps}`` (reference: submodel_trainer.py:707-714)
  * merged ensemble: ``{'state_dict': sub_models.<i>.*, 'metadata':
    {'class_names': [syn_1..syn_N, real]}}`` (model_merger.py:153-159)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization as flax_ser

from synthetic_audio_detection_tpu.checkpoints import torch_compat, torch_pickle
from synthetic_audio_detection_tpu.ensemble.multihead import (
    MultiHeadEnsemble,
    build_ensemble,
    unstack_variables,
)
from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier


# ---------------------------------------------------------------------------
# Native format
# ---------------------------------------------------------------------------

def save_native(path: str, tree: Any, metadata: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a pytree (params/variables/train state) as msgpack with an
    optional JSON metadata sidecar embedded in the same file. Structured
    containers (optax named tuples etc.) are flattened via flax
    ``to_state_dict``; restore into a matching structure with
    ``flax.serialization.from_state_dict``."""
    tree = flax_ser.to_state_dict(jax.tree_util.tree_map(np.asarray, tree))
    payload = {"tree": tree, "metadata": metadata or {}}
    data = flax_ser.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_native(path: str) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        payload = flax_ser.msgpack_restore(f.read())
    return payload["tree"], payload.get("metadata", {})


# ---------------------------------------------------------------------------
# Merged-ensemble checkpoints (both formats)
# ---------------------------------------------------------------------------

def save_merged_native(path: str, ensemble: MultiHeadEnsemble) -> None:
    metadata = {
        "class_names": ensemble.class_names,
        "backbone": ensemble.model.backbone,
        "shared_backbone": ensemble.shared_backbone,
        "shared_trunk_stages": ensemble.shared_trunk_stages,
        "format": "sad-tpu-merged-v1",
    }
    if ensemble.generic_head:
        metadata["generic_head"] = True
    if ensemble.calibration:
        metadata["calibration"] = dict(ensemble.calibration)
    save_native(path, ensemble.variables, metadata=metadata)


def load_merged_native(path: str) -> MultiHeadEnsemble:
    tree, meta = load_native(path)
    model = BinaryClassifier(backbone=meta.get("backbone", "resnet18"))
    tree = jax.tree_util.tree_map(np.asarray, tree)
    generic = bool(meta.get("generic_head", False))
    num_heads = len(meta["class_names"]) - 1 + int(generic)
    ens = build_ensemble(
        model,
        unstack_variables(tree, num_heads),
        meta["class_names"],
        detect_shared_backbone=bool(meta.get("shared_backbone", False)),
        generic_head=generic,
    )
    # trunk sharing is recorded at save time (per_head_stages joint-trainer
    # artifacts) so the load skips the O(N·params) re-detection scan
    trunk_k = int(meta.get("shared_trunk_stages", 0))
    if trunk_k and not ens.shared_backbone:
        ens = dataclasses.replace(ens, shared_trunk_stages=trunk_k)
    if meta.get("calibration"):
        ens = dataclasses.replace(ens, calibration=dict(meta["calibration"]))
    return ens


def save_merged_torch(path: str, ensemble: MultiHeadEnsemble) -> None:
    """Write the reference merged-model contract: torch zip ``.pth`` with
    'sub_models.<i>.base/head.*' keys + metadata.class_names
    (model_merger.py:153-159) — loadable by the reference inference_runner."""
    per_model = unstack_variables(ensemble.variables, ensemble.num_heads)
    sd = torch_compat.merged_state_dict_from_ensembles(
        [jax.tree_util.tree_map(np.asarray, v) for v in per_model]
    )
    metadata: Dict[str, Any] = {"class_names": list(ensemble.class_names)}
    if ensemble.generic_head:
        # extra metadata key; the reference loader reads only class_names
        # (inference_runner.py:250-252), so its round-trip is unaffected —
        # it would serve the generic head as an unnamed extra sub-model
        metadata["generic_head"] = True
    if ensemble.calibration:
        # extra metadata key (same reasoning as generic_head above)
        metadata["calibration"] = dict(ensemble.calibration)
    torch_pickle.save({"state_dict": sd, "metadata": metadata}, path)


def load_merged_torch(path: str, backbone: str = "resnet18") -> MultiHeadEnsemble:
    """Read a reference merged ``.pth`` (inference_runner.py:77-123 contract)
    into a stacked-parameter ensemble."""
    obj = torch_pickle.load(path)
    sd = obj["state_dict"] if isinstance(obj, dict) and "state_dict" in obj else obj
    meta = obj.get("metadata", {}) if isinstance(obj, dict) else {}
    subs = torch_compat.split_merged_state_dict(sd)
    if not subs:
        raise ValueError(f"{path}: no 'sub_models.<i>.*' keys found")
    variable_dicts = [
        torch_compat.classifier_variables_from_torch(s, base_prefix="base.")
        for s in subs
    ]
    class_names = list(meta.get("class_names", []))
    generic = bool(isinstance(meta, dict) and meta.get("generic_head", False))
    expect = len(subs) + 1 - int(generic)
    if len(class_names) != expect:
        generic = False
        class_names = [f"Synthetic_{i + 1}" for i in range(len(subs))] + ["Real"]
    model = BinaryClassifier(backbone=backbone)
    ens = build_ensemble(model, variable_dicts, class_names,
                         generic_head=generic)
    if isinstance(meta, dict) and meta.get("calibration"):
        ens = dataclasses.replace(ens, calibration=dict(meta["calibration"]))
    return ens


def load_merged(path: str, backbone: str = "resnet18") -> MultiHeadEnsemble:
    """Auto-detect native vs torch merged checkpoint."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zip → torch format
        return load_merged_torch(path, backbone)
    try:
        return load_merged_native(path)
    except Exception:
        return load_merged_torch(path, backbone)


# ---------------------------------------------------------------------------
# Sub-model (trainer) checkpoints
# ---------------------------------------------------------------------------

def load_submodel_torch(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a trainer-style or BinaryClassifier-style ``.pth`` into
    BinaryClassifier variables. Returns (variables, extras) where extras
    carries {epoch, best_acc, total_steps} when present."""
    obj = torch_pickle.load(path)
    extras: Dict[str, Any] = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
        for k in ("epoch", "best_acc", "total_steps", "scheduler", "optimizer",
                  "layer3_unfrozen"):
            if k in obj:
                extras[k] = obj[k]
    else:
        sd = obj
    flavor = torch_compat.detect_checkpoint_flavor(sd)
    prefix = "base." if flavor == "classifier" else ""
    variables = torch_compat.classifier_variables_from_torch(sd, base_prefix=prefix)
    extras["flavor"] = flavor
    # the raw torch key order is the optimizer-index space
    # (torch_compat.adam_moments_from_torch needs it to map moments)
    extras["raw_state_dict"] = sd
    return variables, extras


def save_submodel_torch(
    path: str,
    variables: Dict[str, Any],
    epoch: int = 0,
    best_acc: float = 0.0,
    total_steps: int = 0,
    scheduler: Optional[Dict[str, Any]] = None,
    layer3_unfrozen: Optional[bool] = None,
    optimizer: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the reference trainer checkpoint contract
    (submodel_trainer.py:707-714). ``scheduler`` carries the plateau state
    (PlateauState.state_dict()) so resuming from the twin keeps the LR
    trajectory; ``optimizer`` is a torch-AdamW-format state dict
    (torch_compat.torch_optimizer_state_dict) carrying the Adam moments so a
    resume from the twin — ours or the reference's — continues the exact
    optimizer trajectory."""
    sd = torch_compat.torch_state_dict_from_variables(
        jax.tree_util.tree_map(np.asarray, variables)
    )
    payload = {
        "epoch": int(epoch),
        "state_dict": sd,
        "best_acc": float(best_acc),
        "optimizer": dict(optimizer) if optimizer else {},
        "scheduler": dict(scheduler) if scheduler else {},
        "total_steps": int(total_steps),
    }
    if layer3_unfrozen is not None:
        payload["layer3_unfrozen"] = bool(layer3_unfrozen)
    torch_pickle.save(payload, path)
