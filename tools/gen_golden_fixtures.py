"""Generate the golden parity fixture pack (tests/fixtures/golden_v1.npz).

Requires torch (the recording environment). The resulting .npz is consumed by
tests/test_golden_fixtures.py WITHOUT torch — closing the parity loop the
BASELINE 'float tolerance vs the PyTorch reference' language implies, in
environments where torch/torchaudio/timm are absent.

Recorded:
- audio           seeded waveform windows [2, 128000] f32 @32 kHz
- mel             expected inference-config front-end output [2, 512, 512]:
                  NumPy oracle mel (slaney fbanks, reflect-pad STFT, per-item
                  dB top_db=80, unbiased-std standardization — the documented
                  torchaudio semantics, tests/oracles.py) followed by REAL
                  torch bilinear resize (F.interpolate align_corners=False,
                  what the reference's transforms.Resize does)
- logits_h0/h1    torch_ref.TorchBinaryClassifier forward on mel (replicated
                  to 3 channels) under deterministic_state_dict(seed=0/1)
- ensemble_logits reference aggregation [syn_1, syn_2, mean(real)] of the two

Run:  PYTHONPATH=/root/repo:/root/repo/tests python tools/gen_golden_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import torch  # noqa: E402

import oracles  # noqa: E402  (tests/oracles.py)
import torch_ref  # noqa: E402  (tests/torch_ref.py)
from fixture_weights import deterministic_state_dict  # noqa: E402


def front_end_oracle(windows: np.ndarray, out_size: int = 512) -> np.ndarray:
    """Inference-config front end: oracle mel (norm='slaney') → dB → standardize
    → torch bilinear resize. [B, T] → [B, out, out] f32."""
    feats = []
    for w in windows:
        mel = oracles.melspec_oracle(w, norm="slaney")
        db = oracles.amplitude_to_db_oracle(mel)
        z = oracles.standardize_oracle(db)
        t = torch.from_numpy(z.astype(np.float32))[None, None]
        r = torch.nn.functional.interpolate(
            t, size=(out_size, out_size), mode="bilinear", align_corners=False
        )
        feats.append(r[0, 0].numpy())
    return np.stack(feats)


def main() -> None:
    rng = np.random.default_rng(20260816)
    audio = (rng.standard_normal((2, 128_000)) * 0.25).astype(np.float32)
    mel = front_end_oracle(audio)

    x = torch.from_numpy(mel).unsqueeze(1).repeat(1, 3, 1, 1)
    logits = []
    for seed in (0, 1):
        sd = {k: torch.from_numpy(v) for k, v in
              deterministic_state_dict(seed=seed).items()}
        m = torch_ref.TorchBinaryClassifier("resnet18")
        missing, unexpected = m.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        assert all("num_batches_tracked" in k for k in missing), missing
        m.eval()
        with torch.no_grad():
            logits.append(m(x).numpy())
    l0, l1 = logits
    # reference aggregation (model_merger.py:75-91): [syn_1..syn_N, mean(real)]
    ensemble = np.stack(
        [l0[:, 1], l1[:, 1], (l0[:, 0] + l1[:, 0]) / 2.0], axis=1
    ).astype(np.float32)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "golden_v1.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, audio=audio, mel=mel.astype(np.float32),
        logits_h0=l0.astype(np.float32), logits_h1=l1.astype(np.float32),
        ensemble_logits=ensemble,
    )
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
