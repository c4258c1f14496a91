"""CSV-driven model merging (reference model_merger.py:93-160).

Reads the 3-column recipe ``model_filename,synthetic_class,real_class``
(modular/model-merge-example.csv:1-5), loads each sub-model checkpoint, stacks
the parameter trees, resolves the shared real-class name (unanimous, else
most-common — model_merger.py:136-143), smoke-tests the assembled ensemble
with a random batch (:148-151), and writes the merged checkpoint with
``metadata.class_names = [syn_1..syn_N, real]`` (:153-159).

TPU-native design: "merging" is pure checkpoint surgery — stack N variable
trees along a new leading axis; the vmapped ensemble forward needs no module
list. Both native (msgpack) and torch ``.pth`` outputs are supported so the
result round-trips into the reference's own inference_runner.
"""

from __future__ import annotations

import csv
import logging
from collections import Counter
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_audio_detection_tpu.checkpoints import serialization
from synthetic_audio_detection_tpu.ensemble.multihead import (
    MultiHeadEnsemble,
    build_ensemble,
)
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)

log = logging.getLogger(__name__)


def read_merge_recipe(csv_path: str) -> List[Dict[str, str]]:
    """Rows of {model_filename, synthetic_class, real_class}
    (model_merger.py:108-113)."""
    rows = []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            row = {k.strip(): (v or "").strip() for k, v in row.items()}
            if not row.get("model_filename"):
                continue
            rows.append(
                {
                    "model_filename": row["model_filename"],
                    "synthetic_class": row.get("synthetic_class", ""),
                    "real_class": row.get("real_class", "Real"),
                }
            )
    if not rows:
        raise ValueError(f"{csv_path}: empty merge recipe")
    return rows


def resolve_real_name(real_names: List[str]) -> str:
    """Unanimous, else most common (model_merger.py:136-143)."""
    uniq = set(real_names)
    if len(uniq) == 1:
        return real_names[0]
    name, _ = Counter(real_names).most_common(1)[0]
    log.warning("real-class names disagree %s; majority: %s", sorted(uniq), name)
    return name


def _complete_variables(
    variables: Dict[str, Any], model: BinaryClassifier, rng_seed: int = 0
) -> Dict[str, Any]:
    """Fill any missing leaves from a fresh init (mirrors the reference's
    strict=False load + fresh-init fallback, inference_runner.py:101-111)."""
    ref = init_classifier(model, jax.random.PRNGKey(rng_seed))

    def merge(ref_node, got_node):
        if not isinstance(ref_node, dict):
            return ref_node
        out = {}
        for k, v in ref_node.items():
            g = got_node.get(k) if isinstance(got_node, dict) else None
            if isinstance(v, dict):
                out[k] = merge(v, g if isinstance(g, dict) else {})
            else:
                if g is not None and np.asarray(g).shape == np.asarray(v).shape:
                    out[k] = jnp.asarray(np.asarray(g, dtype=np.float32))
                else:
                    if g is not None:
                        log.warning("shape mismatch at %s: ckpt %s vs model %s; "
                                    "using fresh init", k,
                                    np.asarray(g).shape, np.asarray(v).shape)
                    out[k] = v
        return out

    return {
        "params": merge(ref["params"], variables.get("params", {})),
        "batch_stats": merge(ref["batch_stats"], variables.get("batch_stats", {})),
    }


def _load_backbone_donor(path: str, model: BinaryClassifier) -> Dict[str, Any]:
    """Load the backbone ('base') subtree from a donor checkpoint — torch
    ``.pth``/``.pt`` (any flavor) or a native trainer checkpoint. This stands
    in for the reference merger's ``timm.create_model(pretrained=True)``
    ImageNet weights (model_merger.py:24): the reference gets its merged
    backbones from timm's download cache, we get them from an explicit file."""
    if path.endswith((".pth", ".pt")):
        variables, _ = serialization.load_submodel_torch(path)
    else:
        tree, _ = serialization.load_native(path)
        variables = tree["variables"] if "variables" in tree else tree
    variables = _complete_variables(variables, model)
    return {
        "params": variables["params"]["base"],
        "batch_stats": variables["batch_stats"]["base"],
    }


def merge_models(
    submodels_folder: str,
    csv_path: str,
    backbone: str = "resnet18",
    smoke_test: bool = True,
    reference_semantics: bool = False,
    backbone_weights: Optional[str] = None,
) -> MultiHeadEnsemble:
    """Assemble a MultiHeadEnsemble from a CSV recipe of sub-model ``.pth`` /
    native checkpoints (model_merger.py:93-151).

    ``reference_semantics=True`` reproduces the reference merger's
    ``load_state_dict(sd, strict=False)`` into ``BinaryClassifier``
    (model_merger.py:50-55): for trainer-style checkpoints (unprefixed timm
    backbone keys) only ``head.*`` matches the classifier's key space, so the
    merged backbone keeps the *donor* weights (ImageNet in the reference,
    ``backbone_weights`` here) and ONLY the head is imported. Checkpoints
    that already carry ``base.*`` keys match fully either way. The default
    (False) imports trainer backbones too — saner, but produces different
    logits than the reference merger would for trainer-style inputs.
    """
    import os

    if reference_semantics and not backbone_weights:
        raise ValueError(
            "--reference-merge-semantics requires --backbone-weights: the "
            "reference merger takes backbone weights from timm's ImageNet "
            "download (model_merger.py:24); supply an equivalent donor "
            "checkpoint (.pth or native) to stand in for it."
        )

    rows = read_merge_recipe(csv_path)
    model = BinaryClassifier(backbone=backbone)
    donor = (
        _load_backbone_donor(backbone_weights, model)
        if reference_semantics
        else None
    )
    variable_dicts = []
    synthetic_names = []
    real_names = []
    for row in rows:
        path = os.path.join(submodels_folder, row["model_filename"])
        if path.endswith((".pth", ".pt")):
            variables, extras = serialization.load_submodel_torch(path)
        else:
            # native trainer checkpoint (the trainer's primary output; the
            # reference merger only ever sees torch .pth — model_merger.py:46)
            tree, extras = serialization.load_native(path)
            variables = tree["variables"] if "variables" in tree else tree
            extras = dict(extras or {})
            extras.setdefault("flavor", "trainer")
        if donor is not None and extras.get("flavor") == "trainer":
            # strict=False semantics: trainer backbones don't match 'base.*'
            # → keep the donor backbone, import only the trained head.
            variables = {
                "params": {
                    "base": donor["params"],
                    "head": variables["params"].get("head", {}),
                },
                "batch_stats": {
                    "base": donor["batch_stats"],
                    "head": variables["batch_stats"].get("head", {}),
                },
            }
        variables = _complete_variables(variables, model)
        variable_dicts.append(variables)
        synthetic_names.append(row["synthetic_class"] or f"Synthetic_{len(synthetic_names)+1}")
        real_names.append(row["real_class"] or "Real")
        log.info("loaded %s (epoch=%s best_acc=%s)", path,
                 extras.get("epoch"), extras.get("best_acc"))

    class_names = synthetic_names + [resolve_real_name(real_names)]
    ens = build_ensemble(model, variable_dicts, class_names)

    if smoke_test:
        # reference smoke test: randn(2, 3, 512, 512) forward (:148-151)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 512, 3), jnp.float32)
        out = ens(x)
        assert out.shape == (2, len(class_names)), out.shape
        log.info("smoke test output shape: %s", tuple(out.shape))
    return ens


def save_merged(
    ensemble: MultiHeadEnsemble, output_path: str, torch_format: Optional[bool] = None
) -> None:
    """Write the merged checkpoint. ``.pth`` extension (or torch_format=True)
    → reference torch contract; otherwise native msgpack."""
    if torch_format is None:
        torch_format = output_path.endswith((".pth", ".pt"))
    if torch_format:
        serialization.save_merged_torch(output_path, ensemble)
    else:
        serialization.save_merged_native(output_path, ensemble)
