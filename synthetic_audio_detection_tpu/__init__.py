"""TPU-native synthetic-audio (deepfake) detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
TtesseractT/Synthetic-Audio-Detection reference system (see /root/repo/SURVEY.md):
audio normalization to 32 kHz mono, 4-second segmentation, 128-mel
log-spectrogram front end (fused on device), ResNet-backbone binary heads,
multi-head ensemble with the "Real only on unanimous consensus" rule, dataset
ETL, training, checkpointing (including torch ``.pth`` round-trip), and a
JSON-emitting inference runner — all designed TPU-first: static shapes, jitted
batch graphs, vmapped ensemble heads, and ``jax.sharding`` data parallelism.

Subpackages
-----------
- ``ops``         device-side DSP: resample, mel spectrogram, resize, filters
- ``models``      Flax ResNet-18/34/50/101/152 + binary-classifier head
- ``ensemble``    stacked-parameter multi-head ensemble + merge logic
- ``audio``       host-side WAV I/O, decode shims, offline augmentation DSP
- ``data``        dataset ETL (rename/convert/segment/split/leak-check) + input pipeline
- ``train``       jitted train step, schedules, metrics, training loop
- ``checkpoints`` orbax-backed native checkpoints + torch ``.pth`` import/export
- ``parallel``    mesh construction and sharding helpers
- ``infer``       windowed inference runner, smoothing, JSON verdict schema
- ``cli``         CLI entry points mirroring the reference's 9 scripts
"""

__version__ = "0.1.0"

from synthetic_audio_detection_tpu.utils.config import (  # noqa: F401
    AudioConfig,
    SpectrogramConfig,
)
