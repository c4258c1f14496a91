"""Synthetic Audio Detection — TPU-native framework.

Public API (lazy-loaded to keep `import synthetic_audio_detection_tpu` light):

    Config tree:     AudioConfig, SpectrogramConfig, ModelConfig, TrainConfig,
                     InferenceConfig, MeshConfig, PipelineConfig
    Models:          BinaryClassifier, create_resnet
    Ensemble:        MultiHeadEnsemble, build_ensemble, ensemble_forward,
                     decide, merge_models, fold_to_mono
    Serving:         InferencePipeline, LegacyAudioAnalyzer
    Training:        Trainer
    Checkpoints:     load_merged, save_merged_torch, load_submodel_torch
    Sharding:        create_mesh
"""

from __future__ import annotations

__version__ = "0.1.0"

_EXPORTS = {
    # config
    "AudioConfig": "synthetic_audio_detection_tpu.utils.config",
    "SpectrogramConfig": "synthetic_audio_detection_tpu.utils.config",
    "ModelConfig": "synthetic_audio_detection_tpu.utils.config",
    "TrainConfig": "synthetic_audio_detection_tpu.utils.config",
    "InferenceConfig": "synthetic_audio_detection_tpu.utils.config",
    "MeshConfig": "synthetic_audio_detection_tpu.utils.config",
    "PipelineConfig": "synthetic_audio_detection_tpu.utils.config",
    # models
    "BinaryClassifier": "synthetic_audio_detection_tpu.models.classifier",
    "create_resnet": "synthetic_audio_detection_tpu.models.resnet",
    # ensemble
    "MultiHeadEnsemble": "synthetic_audio_detection_tpu.ensemble.multihead",
    "build_ensemble": "synthetic_audio_detection_tpu.ensemble.multihead",
    "ensemble_forward": "synthetic_audio_detection_tpu.ensemble.multihead",
    "decide": "synthetic_audio_detection_tpu.ensemble.multihead",
    "fold_to_mono": "synthetic_audio_detection_tpu.ensemble.multihead",
    "merge_models": "synthetic_audio_detection_tpu.ensemble.merger",
    # serving
    "InferencePipeline": "synthetic_audio_detection_tpu.infer.pipeline",
    "LegacyAudioAnalyzer": "synthetic_audio_detection_tpu.infer.legacy_analyzer",
    # training
    "Trainer": "synthetic_audio_detection_tpu.train.trainer",
    # checkpoints
    "load_merged": "synthetic_audio_detection_tpu.checkpoints.serialization",
    "save_merged_torch": "synthetic_audio_detection_tpu.checkpoints.serialization",
    "load_submodel_torch": "synthetic_audio_detection_tpu.checkpoints.serialization",
    # sharding
    "create_mesh": "synthetic_audio_detection_tpu.parallel.sharding",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        value = getattr(module, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return __all__
