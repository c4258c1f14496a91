"""Calibration tests: temperature fitting against a scipy oracle, ECE,
checkpoint metadata round-trip in both formats, and serving-path engagement
(engaged only when a checkpoint carries calibration — uncalibrated behavior
stays bit-identical to the reference path)."""

import dataclasses

import jax
import numpy as np
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.utils import calibration as cal
from synthetic_audio_detection_tpu.utils.config import (
    InferenceConfig,
    SpectrogramConfig,
)


def _miscalibrated(rng, n=4000, t_true=2.5):
    """Logits whose sigmoid at temperature t_true IS the Bernoulli rate."""
    w = rng.standard_normal(n) * 2.0
    p = 1.0 / (1.0 + np.exp(-w))
    y = (rng.uniform(size=n) < p).astype(np.float64)
    return w * t_true, y


def test_fit_temperature_matches_scipy_oracle(rng):
    scipy_opt = pytest.importorskip("scipy.optimize")
    z, y = _miscalibrated(rng)
    t_fit = cal.fit_temperature(z, y)
    oracle = scipy_opt.minimize_scalar(
        lambda t: cal.binary_nll(z, y, scale=1.0 / t),
        bounds=(cal.T_MIN, cal.T_MAX), method="bounded",
        options={"xatol": 1e-8},
    ).x
    assert t_fit == pytest.approx(oracle, rel=1e-4)
    # and it recovers the planted temperature to sampling noise
    assert t_fit == pytest.approx(2.5, rel=0.15)


def test_fit_temperature_reduces_nll(rng):
    z, y = _miscalibrated(rng, t_true=0.4)
    t = cal.fit_temperature(z, y)
    assert t < 1.0  # underconfident logits → sharpen
    assert cal.binary_nll(z, y, scale=1.0 / t) < cal.binary_nll(z, y)


def test_fit_temperature_degenerate_inputs():
    z = np.array([1.0, -2.0, 3.0])
    assert cal.fit_temperature(z, np.ones(3)) == 1.0          # one class
    assert cal.fit_temperature(np.zeros(3), np.array([0, 1, 1])) == 1.0
    assert cal.fit_temperature(np.array([]), np.array([])) == 1.0
    # perfectly separable: NLL decreases monotonically with sharpening,
    # so the fit lands on the temperature floor instead of diverging
    z = np.array([-3.0, -2.0, 2.0, 3.0])
    y = np.array([0.0, 0.0, 1.0, 1.0])
    assert cal.fit_temperature(z, y) == pytest.approx(cal.T_MIN)


def test_ece_hand_computed():
    # two bins of a 4-bin histogram: [0.1, 0.1] acc 0.5 conf 0.1 → |0.4|;
    # [0.9, 0.9] acc 1.0 conf 0.9 → |0.1|; weights 0.5 each
    probs = np.array([0.1, 0.1, 0.9, 0.9])
    labels = np.array([0.0, 1.0, 1.0, 1.0])
    assert cal.expected_calibration_error(probs, labels, n_bins=4) == (
        pytest.approx(0.5 * 0.4 + 0.5 * 0.1)
    )
    assert cal.expected_calibration_error(np.array([]), np.array([])) == 0.0
    # p = 1.0 must land in the last bin, not out of range
    assert cal.expected_calibration_error(
        np.array([1.0]), np.array([1.0]), n_bins=10
    ) == pytest.approx(0.0)


def test_fit_ensemble_calibration_report(rng):
    scipy_opt = pytest.importorskip("scipy.optimize")
    names = ["SynA", "SynB", "Real"]
    n = 3000
    ci = rng.integers(0, 3, size=n)
    # per-column logits with class-dependent shift and varying sharpness —
    # overlapping enough that each column has a finite optimal temperature
    t_scale = [3.0, 0.5, 2.0]
    z = np.stack(
        [(rng.standard_normal(n) * 2.0 + 1.5 * ((ci == j) * 2 - 1))
         * t_scale[j] for j in range(3)], axis=1)
    out = cal.fit_ensemble_calibration(z, ci, names, fit_on="unit-test")
    assert out["column_names"] == names
    assert len(out["temperatures"]) == 3
    for j in range(3):
        target = (ci == j).astype(np.float64)
        assert out["nll_after"][j] <= out["nll_before"][j] + 1e-9
        # each column's fit matches an independent bounded scipy minimization
        oracle = scipy_opt.minimize_scalar(
            lambda t, j=j, tg=target: cal.binary_nll(z[:, j], tg, scale=1.0 / t),
            bounds=(cal.T_MIN, cal.T_MAX), method="bounded",
            options={"xatol": 1e-8},
        ).x
        assert out["temperatures"][j] == pytest.approx(oracle, rel=1e-3)
    assert out["fit_on"] == "unit-test"
    assert "threshold" not in out

    with_thr = cal.fit_ensemble_calibration(
        z, ci, names, store_eer_threshold=True)
    assert 0.0 < with_thr["threshold"] < 1.0


def test_apply_calibration(rng):
    z = rng.standard_normal((5, 3)).astype(np.float32)
    ident = cal.apply_calibration(z, {"temperatures": [1.0, 1.0, 1.0]})
    np.testing.assert_array_equal(ident, z)
    scaled = cal.apply_calibration(z, {"temperatures": [2.0, 1.0, 4.0]})
    np.testing.assert_allclose(scaled, z / np.array([2.0, 1.0, 4.0],
                                                    np.float32), rtol=1e-6)
    with pytest.raises(ValueError):
        cal.apply_calibration(z, {"temperatures": [1.0, 1.0]})


# ---------------------------------------------------------------------------
# Serving-path engagement
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_ensemble():
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    return build_ensemble(model, vds, ["SynA", "SynB", "Real"],
                          detect_shared_backbone=False)


def _pipe(ens, **infer_kw):
    return InferencePipeline(
        ens,
        spec=SpectrogramConfig(mel_norm="slaney", out_size=64),
        infer=InferenceConfig(batch_size=8, **infer_kw),
        use_pallas=False,
    )


def test_pipeline_calibration_engagement(tiny_ensemble, rng):
    windows = (rng.standard_normal((3, 128_000)) * 0.3).astype(np.float32)
    stamps = [(0.0, 4.0), (4.0, 8.0), (8.0, 12.0)]
    raw = _pipe(tiny_ensemble).analyze_windows(windows, stamps)

    calibrated = dataclasses.replace(
        tiny_ensemble,
        calibration={"temperatures": [10.0, 10.0, 10.0]})
    out = _pipe(calibrated).analyze_windows(windows, stamps)
    # T=10 pulls every sigmoid toward 0.5: percentages must move toward 50
    for name, pct in out["percentages"].items():
        assert abs(pct - 50.0) < abs(raw["percentages"][name] - 50.0) + 1e-9

    # opt-out restores the raw path exactly
    off = _pipe(calibrated, apply_calibration=False).analyze_windows(
        windows, stamps)
    assert off == raw

    # T=1 calibration is numerically the identity
    unit = dataclasses.replace(
        tiny_ensemble, calibration={"temperatures": [1.0, 1.0, 1.0]})
    assert _pipe(unit).analyze_windows(windows, stamps) == raw


def test_pipeline_threshold_precedence(tiny_ensemble):
    calibrated = dataclasses.replace(
        tiny_ensemble,
        calibration={"temperatures": [1.0, 1.0, 1.0], "threshold": 0.7})
    # default 0.5 → the calibration-stored operating point engages
    assert _pipe(calibrated)._threshold == pytest.approx(0.7)
    # an explicit non-default --threshold wins
    assert _pipe(calibrated, threshold=0.3)._threshold == pytest.approx(0.3)
    # opt-out disables the stored threshold along with the temperatures
    assert _pipe(calibrated, apply_calibration=False)._threshold == 0.5
    # no calibration → plain default
    assert _pipe(tiny_ensemble)._threshold == 0.5


# ---------------------------------------------------------------------------
# Checkpoint round-trip (both formats)
# ---------------------------------------------------------------------------

def test_calibration_roundtrip_both_formats(tiny_ensemble, tmp_path):
    from synthetic_audio_detection_tpu.checkpoints import serialization

    caldict = {
        "temperatures": [2.0, 0.5, 1.5],
        "column_names": ["SynA", "SynB", "Real"],
        "threshold": 0.62,
        "fit_on": "test",
    }
    ens = dataclasses.replace(tiny_ensemble, calibration=caldict)

    native = str(tmp_path / "m.ckpt")
    serialization.save_merged_native(native, ens)
    back = serialization.load_merged(native)
    assert back.calibration == caldict

    torch_path = str(tmp_path / "m.pth")
    serialization.save_merged_torch(torch_path, ens)
    back_t = serialization.load_merged(torch_path)
    assert back_t.calibration == caldict

    # uncalibrated checkpoints stay calibration-free
    serialization.save_merged_native(native, tiny_ensemble)
    assert serialization.load_merged(native).calibration is None


# ---------------------------------------------------------------------------
# Decision-layer extensions (per-column thresholds, K-of-N override)
# ---------------------------------------------------------------------------

def test_fit_column_thresholds(rng):
    names = ["SynA", "SynB", "Real"]
    n = 3000
    ci = rng.integers(0, 3, size=n)
    z = np.stack(
        [rng.standard_normal(n) * 2.0 + 1.5 * ((ci == j) * 2 - 1)
         for j in range(3)], axis=1)
    out = cal.fit_ensemble_calibration(
        z, ci, names, store_column_thresholds=True)
    thr = out["column_thresholds"]
    assert len(thr) == 3 and all(0.0 < t < 1.0 for t in thr)
    # each column's stored point reproduces equal_error_rate on the
    # calibrated sigmoid (the serving-side definition)
    from synthetic_audio_detection_tpu.utils.metrics import equal_error_rate

    for j in range(3):
        p = cal.stable_sigmoid(z[:, j] / out["temperatures"][j])
        _, oracle = equal_error_rate(p, (ci == j).astype(np.int64))
        assert thr[j] == pytest.approx(oracle, abs=1e-6)

    # a column with no positives in the fit data falls back to 0.5
    ci_degen = np.where(ci == 0, 1, ci)
    out2 = cal.fit_ensemble_calibration(
        z, ci_degen, names, store_column_thresholds=True)
    assert out2["column_thresholds"][0] == 0.5


def test_decide_rows_defaults_match_reference_rule(tiny_ensemble, rng):
    pipe = _pipe(tiny_ensemble)
    probs = rng.uniform(size=(64, 3)).astype(np.float32)
    # plant exact-boundary values: the >= / < asymmetry must match
    probs[:8] = 0.5
    syn, real = probs[:, :-1], probs[:, -1]
    got = pipe._decide_rows(syn, real)
    ref = (real >= 0.5) & (syn < 0.5).all(axis=1)  # inference_runner.py:205-213
    np.testing.assert_array_equal(got, ref)


def test_syn_override_k(tiny_ensemble):
    syn = np.array([[0.9, 0.1, 0.1],   # one strong head
                    [0.9, 0.8, 0.1],   # two strong heads
                    [0.1, 0.2, 0.3]])  # none
    real = np.array([0.9, 0.9, 0.9])
    k1 = _pipe(tiny_ensemble, syn_override_k=1)
    k2 = _pipe(tiny_ensemble, syn_override_k=2)
    # note: tiny_ensemble has 2 heads but _decide_rows is shape-generic on
    # its inputs; thresholds broadcast from the scalar default
    k1._col_thr_vis = np.full(4, 0.5, np.float32)
    k2._col_thr_vis = np.full(4, 0.5, np.float32)
    np.testing.assert_array_equal(
        k1._decide_rows(syn, real), [False, False, True])
    np.testing.assert_array_equal(
        k2._decide_rows(syn, real), [True, False, True])


def test_per_column_thresholds_engagement(tiny_ensemble):
    calibrated = dataclasses.replace(
        tiny_ensemble,
        calibration={"temperatures": [1.0, 1.0, 1.0],
                     "column_thresholds": [0.9, 0.9, 0.3]})
    pipe = _pipe(calibrated, per_column_thresholds=True)
    np.testing.assert_allclose(pipe._col_thr, [0.9, 0.9, 0.3])
    # syn 0.6 would override under the 0.5 default but not at its 0.9
    # operating point; real 0.4 clears its 0.3 point
    syn = np.array([[0.6, 0.55]])
    real = np.array([0.4])
    assert pipe._decide_rows(syn, real).tolist() == [True]
    default = _pipe(calibrated)
    assert default._decide_rows(syn, real).tolist() == [False]

    # engagement requires a calibrated checkpoint carrying the thresholds
    with pytest.raises(ValueError, match="column_thresholds"):
        _pipe(tiny_ensemble, per_column_thresholds=True)
    bad = dataclasses.replace(
        tiny_ensemble,
        calibration={"temperatures": [1.0, 1.0, 1.0],
                     "column_thresholds": [0.9, 0.3]})
    with pytest.raises(ValueError, match="columns"):
        _pipe(bad, per_column_thresholds=True)


def test_fit_sidak_column_thresholds(rng):
    names = ["SynA", "SynB", "SynC", "Real"]
    n = 4000
    ci = rng.integers(0, 4, size=n)
    z = np.stack(
        [rng.standard_normal(n) * 2.0 + 1.5 * ((ci == j) * 2 - 1)
         for j in range(4)], axis=1)
    alpha = 0.10
    out = cal.fit_ensemble_calibration(
        z, ci, names, store_column_thresholds=True,
        column_threshold_method="sidak", sidak_alpha=alpha)
    thr = np.asarray(out["column_thresholds"])
    assert out["column_threshold_method"] == "sidak"
    assert out["sidak_alpha"] == alpha
    assert thr[-1] == 0.5  # real column stays at the calibrated point

    # the defining property: on the FIT real windows, each head's FPR is
    # q = 1-(1-alpha)^(1/N), so the compounded any-head rate is <= alpha
    # (equality under independence)
    real = z[ci == 3]
    temps = np.asarray(out["temperatures"])
    p = cal.stable_sigmoid(real[:, :3] / temps[:3])
    q = 1.0 - (1.0 - alpha) ** (1.0 / 3.0)
    per_head = (p >= thr[:3]).mean(axis=0)
    assert (per_head <= q + 2e-3).all()
    assert (p >= thr[:3]).any(axis=1).mean() <= alpha + 5e-3

    # method validation
    with pytest.raises(ValueError, match="column_threshold_method"):
        cal.fit_ensemble_calibration(
            z, ci, names, store_column_thresholds=True,
            column_threshold_method="nope")
    with pytest.raises(ValueError, match="sidak_alpha"):
        cal.fit_ensemble_calibration(
            z, ci, names, store_column_thresholds=True,
            column_threshold_method="sidak", sidak_alpha=1.5)


def test_fit_calibration_generic_head_columns():
    from synthetic_audio_detection_tpu.utils.calibration import (
        fit_ensemble_calibration,
    )
    """Generic-head artifacts carry one extra column; its calibration
    target is 'any synthetic' and its Šidák-mode threshold is the DIRECT
    (1 - alpha) real-window quantile (one head bounds the real-FPR without
    the Šidák split)."""
    rng = np.random.default_rng(0)
    n = 600
    ci = rng.integers(0, 3, n)  # classes: A, B, Real(idx 2)
    z = rng.standard_normal((n, 4)).astype(np.float32)  # A, B, generic, real
    # make the generic column informative: high for synthetic rows
    z[:, 2] += np.where(ci != 2, 1.2, -1.2)  # informative but OVERLAPPING
    cal = fit_ensemble_calibration(
        z, ci, ["A", "B", "Real"], store_eer_threshold=True,
        store_column_thresholds=True, generic_head=True)
    assert len(cal["temperatures"]) == 4
    assert cal["column_names"] == ["A", "B", "__generic__", "Real"]
    assert len(cal["column_thresholds"]) == 4

    alpha = 0.10
    cal_s = fit_ensemble_calibration(
        z, ci, ["A", "B", "Real"], store_column_thresholds=True,
        column_threshold_method="sidak", sidak_alpha=alpha,
        generic_head=True)
    thr = cal_s["column_thresholds"]
    # generic slot: direct alpha quantile of calibrated real-window probs
    temps = np.asarray(cal_s["temperatures"])
    p_real = 1.0 / (1.0 + np.exp(-(z[ci == 2, 2] / temps[2]).astype(np.float64)))
    assert thr[2] == pytest.approx(float(np.quantile(p_real, 1.0 - alpha)),
                                   abs=1e-5)
    # the stored point is a probability; tie density at the rounded
    # threshold makes an exact FPR assertion brittle — the quantile
    # contract above is the pinned property (the compound-bound oracle
    # test covers the Šidák specialists)
    assert 0.0 < thr[2] < 1.0

    # size mismatch guard
    with pytest.raises(ValueError, match="columns"):
        fit_ensemble_calibration(z[:, :3], ci, ["A", "B", "Real"],
                                 generic_head=True)


def test_decision_ab_generic_verdict_label():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.decision_ab import verdict_label

    # columns: [A, B, generic, Real]; 3 windows of one file
    probs = np.array([
        [0.9, 0.1, 0.2, 0.6],
        [0.8, 0.2, 0.1, 0.7],
        [0.7, 0.1, 0.3, 0.6],
    ], np.float32)
    thr = np.full(4, 0.5, np.float32)
    # unanimity rule on the VISIBLE columns: A is strong => SynA
    assert verdict_label(probs, thr, 1, ["A", "B", "Real"],
                         generic_head=True) == "A"
    # generic verdict: generic < 0.5 everywhere => Real, despite strong A
    assert verdict_label(probs, thr, 1, ["A", "B", "Real"],
                         generic_head=True, generic_thr=0.5) == "Real"
