"""Orbax backend round-trip."""

import numpy as np
import pytest

from synthetic_audio_detection_tpu.checkpoints.orbax_io import OrbaxCheckpointer


def test_orbax_roundtrip(tmp_path, rng):
    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), max_to_keep=2)
    tree = {
        "params": {"w": rng.standard_normal((4, 4)).astype(np.float32)},
        "step": np.int32(7),
    }
    ckpt.save(1, tree, metadata={"best_acc": 0.9})
    ckpt.save(2, tree, metadata={"best_acc": 0.95})
    ckpt.wait()
    got, meta = ckpt.restore()
    assert meta["best_acc"] == 0.95
    np.testing.assert_array_equal(got["params"]["w"], tree["params"]["w"])
    assert ckpt.latest_step() == 2
    # retention: save a third, oldest evicted
    ckpt.save(3, tree, metadata={"best_acc": 0.99})
    ckpt.wait()
    steps = sorted(int(p.name) for p in (tmp_path / "orbax").iterdir()
                   if p.name.isdigit())
    assert steps == [2, 3]
    ckpt.close()
