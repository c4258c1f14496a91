"""Differential fuzz: native WAV parser vs the pure-Python twin on corrupted
input.

The serving daemon decodes untrusted uploaded bytes (infer/server.py
/analyze), so the parsers must fail *cleanly* on malformed files — the
reference inherits this robustness from ffmpeg/torchaudio
(audio_convert.py:26-34, inference_runner.py:145); here the contract is
pinned directly: for any mutation of a valid WAV, audio/wavio.py and
native/sadio.cpp either BOTH decode to the same samples or BOTH raise a
ValueError subtype. No struct.error/np exceptions may leak, and the native
library must never crash the process (every case below runs in-process).

Deterministic corpus: structured adversarial cases (truncations at every
offset stride, oversized/zero chunk sizes, zero channels, bogus bit depths,
truncated WAVE_FORMAT_EXTENSIBLE GUIDs) plus seeded random byte flips.
"""

import struct

import numpy as np
import pytest

from synthetic_audio_detection_tpu.audio import native, wavio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsadio.so not built (make -C native)"
)


def _render(waveform, sr, tag, bits):
    """Hand-rolled RIFF render covering the read-side subtype matrix
    (write_wav itself only emits PCM_16/FLOAT)."""
    ch, n = waveform.shape
    inter = waveform.T.reshape(-1)
    if tag == 0x0001 and bits == 16:
        raw = np.clip(np.round(inter * 32768), -32768, 32767).astype("<i2").tobytes()
    elif tag == 0x0001 and bits == 32:
        raw = np.clip(np.round(inter * 2147483648), -2**31, 2**31 - 1).astype("<i4").tobytes()
    elif tag == 0x0001 and bits == 24:
        v = np.clip(np.round(inter * 8388608), -8388608, 8388607).astype(np.int32)
        u = (v & 0xFFFFFF).astype(np.uint32)
        raw = np.stack([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF],
                       axis=1).astype(np.uint8).tobytes()
    elif tag == 0x0001 and bits == 8:
        raw = np.clip(np.round(inter * 128 + 128), 0, 255).astype(np.uint8).tobytes()
    elif tag == 0x0003 and bits == 32:
        raw = inter.astype("<f4").tobytes()
    elif tag == 0x0003 and bits == 64:
        raw = inter.astype("<f8").tobytes()
    else:
        raise AssertionError(f"unhandled render {tag}/{bits}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _valid_wavs(rng):
    """A few small valid files across the supported subtype matrix."""
    out = []
    for name, tag, bits, ch in [("PCM_16", 1, 16, 2), ("PCM_16", 1, 16, 1),
                                ("FLOAT", 3, 32, 2), ("FLOAT64", 3, 64, 1),
                                ("PCM_24", 1, 24, 3), ("PCM_32", 1, 32, 1),
                                ("PCM_U8", 1, 8, 2)]:
        x = (rng.standard_normal((ch, 37)) * 0.4).astype(np.float32)
        out.append((name, _render(x, 8000, tag, bits)))
    return out


def _decode_both(tmp_path, blob, idx):
    """(python_result, native_result) where each is ('ok', mono, sr) or
    ('err',). Anything other than ValueError (incl. WavFormatError) leaking
    fails the test."""
    p = tmp_path / f"m{idx}.wav"
    p.write_bytes(blob)
    try:
        wf, sr = wavio.read_wav(str(p))
        py = ("ok", wf.mean(axis=0).astype(np.float32), sr)
    except ValueError:
        py = ("err",)
    try:
        mono, sr = native.read_mono(str(p))
        nat = ("ok", mono, sr)
    except ValueError:
        nat = ("err",)
    return py, nat


def _assert_agree(py, nat, blob, note):
    ctx = f"{note}: py={py[0]} native={nat[0]} len={len(blob)}"
    assert py[0] == nat[0], ctx
    if py[0] == "ok":
        assert py[2] == nat[2], f"sample rate diverged: {ctx}"
        assert py[1].shape == nat[1].shape, f"frame count diverged: {ctx}"
        np.testing.assert_allclose(py[1], nat[1], atol=1e-6, err_msg=ctx)


def test_truncations_agree(tmp_path):
    rng = np.random.default_rng(11)
    idx = 0
    for subtype, blob in _valid_wavs(rng):
        for cut in list(range(0, min(len(blob), 64))) + \
                list(range(64, len(blob), 7)):
            py, nat = _decode_both(tmp_path, blob[:cut], idx)
            idx += 1
            _assert_agree(py, nat, blob[:cut], f"{subtype} truncated@{cut}")


def test_header_field_mutations_agree(tmp_path):
    rng = np.random.default_rng(12)
    _, blob = _valid_wavs(rng)[0]  # PCM_16 stereo
    fmt_at = blob.index(b"fmt ")
    data_at = blob.index(b"data")
    cases = []
    # chunk-size lies: zero, odd, huge, off-by-one past EOF
    for at, name in [(fmt_at, "fmt"), (data_at, "data")]:
        for csize in (0, 1, 15, 16, 0xFFFFFFFF, len(blob)):
            b = bytearray(blob)
            struct.pack_into("<I", b, at + 4, csize)
            cases.append((bytes(b), f"{name} csize={csize}"))
    # zero channels / silly channel counts
    for ch in (0, 255, 65535):
        b = bytearray(blob)
        struct.pack_into("<H", b, fmt_at + 8 + 2, ch)
        cases.append((bytes(b), f"channels={ch}"))
    # bogus bit depths
    for bits in (0, 12, 20, 64, 255):
        b = bytearray(blob)
        struct.pack_into("<H", b, fmt_at + 8 + 14, bits)
        cases.append((bytes(b), f"bits={bits}"))
    # bogus format tags (incl. extensible with NO GUID bytes)
    for tag in (0x0000, 0x0002, 0x0055, 0xFFFE):
        b = bytearray(blob)
        struct.pack_into("<H", b, fmt_at + 8, tag)
        cases.append((bytes(b), f"tag={tag:#x}"))
    # data chunk truncated mid-sample (frame floor semantics)
    for drop in (1, 2, 3):
        cases.append((blob[:-drop], f"mid-sample truncation -{drop}"))
    for i, (mut, note) in enumerate(cases):
        py, nat = _decode_both(tmp_path, mut, i)
        _assert_agree(py, nat, mut, note)


def test_extensible_guid_truncation_agrees(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE whose declared 40-byte fmt chunk is cut short:
    the clamped effective size must gate the GUID reinterpretation in both
    parsers (native/sadio.cpp parse_wav clamps csize; wavio uses len(body))."""
    rng = np.random.default_rng(13)
    _, blob = _valid_wavs(rng)[0]
    fmt_at = blob.index(b"fmt ")
    b = bytearray(blob[: fmt_at + 8 + 16])  # keep header + 16-byte fmt body
    struct.pack_into("<I", b, fmt_at + 4, 40)      # declare extensible size
    struct.pack_into("<H", b, fmt_at + 8, 0xFFFE)  # extensible tag
    for extra in (0, 8, 10, 24, 26):  # GUID bytes actually present
        mut = bytes(b) + b"\x00" * 24 + struct.pack("<H", 0x0001) + b"\x00" * 14
        mut = mut[: len(b) + extra]
        py, nat = _decode_both(tmp_path, mut, extra)
        _assert_agree(py, nat, mut, f"extensible guid cut to {extra}")


def test_random_byte_flips_agree(tmp_path):
    rng = np.random.default_rng(14)
    wavs = _valid_wavs(rng)
    idx = 0
    for _ in range(40):
        subtype, blob = wavs[rng.integers(len(wavs))]
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(len(b)))] = int(rng.integers(256))
        py, nat = _decode_both(tmp_path, bytes(b), idx)
        idx += 1
        _assert_agree(py, nat, bytes(b), f"{subtype} random flips")


def test_pathological_headers_reject_cleanly(tmp_path):
    cases = [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVE",          # header only, no chunks
        b"RIFF\xff\xff\xff\xffWAVE" + b"junk" * 10,
        b"FORM\x00\x00\x00\x10AIFF" + b"\x00" * 32,  # wrong container
        b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00",  # data, no fmt
        b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + b"\x00" * 16,  # fmt, no data
    ]
    for i, blob in enumerate(cases):
        py, nat = _decode_both(tmp_path, blob, i)
        assert py == ("err",), f"case {i}: python accepted garbage"
        assert nat == ("err",), f"case {i}: native accepted garbage"
