"""Grain-based input pipeline (production alternative to the threaded batcher).

data.dataset.WaveformBatcher is the dependency-light default; this module
provides the same batch contract through Grain — deterministic global
shuffling, worker *processes* (true parallel decode past the GIL without the
native library), checkpointable iteration state, and per-epoch reshuffling —
the role torch's DataLoader plays in the reference (submodel_trainer.py:491-509)
at production scale.

Batch contract (matches WaveformBatcher + pad_batch):
    {'audio': [2B, T] float32, 'label': [2B] int32, 'weight': [2B] float32}
with rows of dropped/corrupt files weighted 0 (static shapes for jit).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from synthetic_audio_detection_tpu.data.dataset import (
    SEGMENT_SAMPLES,
    load_two_segments,
)


def _decode_two_segments(sample: Tuple[str, int]) -> Dict[str, np.ndarray]:
    """(path, label) → fixed-shape per-file record (picklable for workers)."""
    path, label = sample
    segs = load_two_segments(path)
    if segs is None:
        return {
            "audio": np.zeros((2, SEGMENT_SAMPLES), np.float32),
            "label": np.full(2, label, np.int32),
            "weight": np.zeros(2, np.float32),
        }
    return {
        "audio": segs,
        "label": np.full(2, label, np.int32),
        "weight": np.ones(2, np.float32),
    }


def _collate(records: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {
        "audio": np.concatenate([r["audio"] for r in records], axis=0),
        "label": np.concatenate([r["label"] for r in records], axis=0),
        "weight": np.concatenate([r["weight"] for r in records], axis=0),
    }


def make_grain_loader(
    samples: Sequence[Tuple[str, int]],
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    workers: int = 4,
    num_epochs: Optional[int] = None,
    drop_remainder: bool = True,
):
    """Iterator of jit-ready batches {'audio': [2B, T], 'label', 'weight'}.

    `batch_size` counts files (each contributes 2 segment rows), like the
    reference DataLoader. drop_remainder keeps shapes static without padding.
    """
    import grain.python as gp

    ds = gp.MapDataset.source(list(samples))
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if num_epochs is not None and num_epochs != 1:
        ds = ds.repeat(num_epochs)
    ds = ds.map(_decode_two_segments)
    it = ds.to_iter_dataset(
        read_options=gp.ReadOptions(num_threads=max(1, workers),
                                    prefetch_buffer_size=4 * batch_size)
    )
    it = it.batch(batch_size, drop_remainder=drop_remainder, batch_fn=_collate)
    if workers > 1:
        it = it.mp_prefetch(
            gp.MultiprocessingOptions(num_workers=workers)
        )
    return it
