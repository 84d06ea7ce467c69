"""zQSO estimation vs the reference ZGP on synthetic data."""

import numpy as np
import pytest

from gpy_dla_detection_tpu.models.zqso import (
    ZLearnedModel,
    inference_z_qso,
    prepare_z_spectrum,
    z_log_evidence,
)
from gpy_dla_detection_tpu.params import ZParameters

from .reference_oracle import import_reference


def _z_learned(seed=0, k=5):
    from gpy_dla_detection_tpu.data.synthetic import synthetic_z_learned_model

    return synthetic_z_learned_model(seed=seed, k=k)


def _observation(learned, z_true, seed=0, noise=0.08):
    rng = np.random.default_rng(seed)
    wl = 3600.0 * 10 ** (1e-4 * np.arange(4600))
    rest = wl / (1 + z_true)
    mu = np.interp(rest, learned.rest_wavelengths, learned.mu)
    M = np.stack(
        [
            np.interp(rest, learned.rest_wavelengths, learned.M[:, i])
            for i in range(learned.M.shape[1])
        ],
        axis=1,
    )
    out = (rest < learned.rest_wavelengths[0]) | (rest > learned.rest_wavelengths[-1])
    M[out] = 0.0
    flux = mu + M @ rng.normal(size=M.shape[1])
    flux[out] = np.where(
        rest[out] < learned.rest_wavelengths[0], 0.2, 0.8
    )
    nv = np.full_like(wl, noise**2)
    flux += noise * rng.normal(size=wl.shape)
    pm = np.zeros(wl.shape, bool)
    return wl, flux, nv, pm


def test_z_log_evidence_matches_reference():
    import_reference()
    from gpy_dla_detection.zqso_gp import ZGP
    from gpy_dla_detection.zqso_samples import ZSamples
    from gpy_dla_detection.zqso_set_parameters import ZParameters as RefZParameters

    params = ZParameters(k=5)
    learned = _z_learned()
    wl, flux, nv, pm = _observation(learned, z_true=3.2, seed=4)
    spec = prepare_z_spectrum(wl, flux, nv, pm)

    ref_params = RefZParameters(k=5)
    ref = ZGP(
        ref_params,
        ZSamples(ref_params),
        rest_wavelengths=learned.rest_wavelengths,
        mu=learned.mu,
        M=learned.M,
        bluewards_mu=float(learned.bluewards_mu),
        redwards_mu=float(learned.redwards_mu),
        bluewards_sigma=float(learned.bluewards_sigma),
        redwards_sigma=float(learned.redwards_sigma),
    )

    for z in [2.6, 3.2, 4.0]:
        ref.set_data(wl.copy(), flux.copy(), nv.copy(), pm.copy(), z)
        want = float(ref.log_model_evidence())
        got = float(z_log_evidence(learned, spec, np.float64(z), params))
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_inference_recovers_redshift():
    params = ZParameters(k=5, num_zqso_samples=400)
    learned = _z_learned()
    z_true = 3.37
    wl, flux, nv, pm = _observation(learned, z_true, seed=9)
    spec = prepare_z_spectrum(wl, flux, nv, pm)
    z_map, lls, grid = inference_z_qso(learned, spec, params)
    assert abs(z_map - z_true) < 0.05, z_map


def test_batch_redshift_accuracy():
    """Batch accuracy criterion mirroring the reference's acceptance
    test: P(|z_map - z_true| < 0.5) must be high over a set of spectra
    (reference: tests/test_zestimation.py:53-70 requires > 0.98 over
    100 real spectra; here: all of 8 synthetic ones)."""
    params = ZParameters(k=5, num_zqso_samples=300)
    learned = _z_learned()
    rng = np.random.default_rng(3)
    hits = 0
    n = 8
    for i in range(n):
        z_true = float(rng.uniform(2.4, 4.6))
        wl, flux, nv, pm = _observation(learned, z_true, seed=50 + i)
        spec = prepare_z_spectrum(wl, flux, nv, pm)
        z_map, _, _ = inference_z_qso(learned, spec, params)
        hits += abs(z_map - z_true) < 0.5
    assert hits == n, hits


def test_shift_scan_matches_exact_scan():
    """The log-resampled shift scan (no per-z gathers) must agree with
    the exact scan near the evidence peak and pick the same MAP z."""
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.models.zqso import (
        detect_pixel_dlog,
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters(num_zqso_samples=800)
    learned = _z_learned()
    wl, flux, nv, pm = _observation(learned, z_true=3.2, seed=4)
    assert abs(detect_pixel_dlog(wl) - 1e-4) < 1e-7
    spec = prepare_z_spectrum(wl, flux, nv, pm, 5632)

    z_s, lls_s, zg = inference_z_qso(learned, spec, params, method="shift")
    z_e, lls_e, _ = inference_z_qso(learned, spec, params, method="exact")
    assert z_s == z_e
    assert abs(z_s - 3.2) < 0.05

    fin = np.isfinite(lls_e) & np.isfinite(lls_s)
    peak = np.nanargmax(lls_e)
    near = fin & (np.abs(zg - zg[peak]) < 0.2)
    # resample error near the peak is orders of magnitude below the
    # peak's margin over the rest of the grid
    margin = lls_e[peak] - np.nanmax(
        np.where(np.abs(zg - zg[peak]) > 0.2, np.where(fin, lls_e, -np.inf), -np.inf)
    )
    assert np.nanmax(np.abs(lls_s - lls_e)[near]) < 0.01 * margin


def test_detect_pixel_dlog_rejects_nonuniform():
    from gpy_dla_detection_tpu.models.zqso import detect_pixel_dlog

    wl = 3600.0 * 10 ** (1e-4 * np.arange(1000))
    assert detect_pixel_dlog(wl) is not None
    # linear grid is not log-uniform
    assert detect_pixel_dlog(np.linspace(3600, 9000, 1000)) is None
    # padded tail (zero diffs) is tolerated
    wl_padded = np.concatenate([wl, np.full(64, wl[-1])])
    assert detect_pixel_dlog(wl_padded) is not None
    # but interior duplicates are not
    wl_bad = wl.copy(); wl_bad[500] = wl_bad[499]
    assert detect_pixel_dlog(wl_bad) is None


def test_shift_scan_low_z_edge_no_clamp():
    """Regression: the scan table must be sized for the PADDED P-row
    slice — previously dynamic_slice start-clamped at low z and shifted
    the model for every pixel (z_true=2.16 came back as z_min)."""
    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters(num_zqso_samples=800)
    learned = _z_learned()
    wl, flux, nv, pm = _observation(learned, z_true=2.16, seed=11)
    spec = prepare_z_spectrum(wl, flux, nv, pm, 5632)

    z_s, _, _ = inference_z_qso(learned, spec, params, method="shift")
    z_e, _, _ = inference_z_qso(learned, spec, params, method="exact")
    assert z_s == z_e, (z_s, z_e)
    assert abs(z_s - 2.16) < 0.05, z_s


def test_inference_method_validation():
    import pytest

    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters(num_zqso_samples=16)
    learned = _z_learned()
    wl, flux, nv, pm = _observation(learned, z_true=3.0, seed=1)
    spec = prepare_z_spectrum(wl, flux, nv, pm, 5632)
    with pytest.raises(ValueError, match="unknown method"):
        inference_z_qso(learned, spec, params, method="fast")
    # shift on a non-log-uniform grid must refuse, not silently degrade
    spec_lin = prepare_z_spectrum(
        np.linspace(3600, 9000, 1000), np.ones(1000), np.ones(1000),
        np.zeros(1000, bool), 5632,
    )
    with pytest.raises(ValueError, match="log-uniform"):
        inference_z_qso(learned, spec_lin, params, method="shift")


def test_detect_pixel_dlog_rejects_cumulative_drift():
    """A quasi-log-uniform grid (narrow-band linear) has small per-diff
    jitter but large accumulated drift — it must be rejected."""
    from gpy_dla_detection_tpu.models.zqso import detect_pixel_dlog

    wl = np.linspace(6000.0, 6300.0, 3000)  # dlog varies ~5% end to end
    assert detect_pixel_dlog(wl) is None


def test_inference_many_streams_bounded_and_nan_safe():
    """inference_z_qso_many consumes a generator lazily with a bounded
    in-flight window, returns NaN for a fully-masked spectrum instead
    of raising, and matches the per-spectrum path."""
    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        inference_z_qso_many,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters(num_zqso_samples=200)
    learned = _z_learned()
    specs, z_trues = [], [2.8, 3.4]
    for i, z in enumerate(z_trues):
        wl, flux, nv, pm = _observation(learned, z_true=z, seed=20 + i)
        specs.append(prepare_z_spectrum(wl, flux, nv, pm, 5632))
    # a fully-masked spectrum in the middle of the stream
    wl, flux, nv, pm = _observation(learned, z_true=3.0, seed=30)
    dead = prepare_z_spectrum(wl, flux, nv, np.ones(len(wl), bool), 5632)
    stream = iter([specs[0], dead, specs[1]])

    results, z_grid = inference_z_qso_many(
        learned, stream, params, keep_lls=True, max_in_flight=1
    )
    assert len(results) == 3
    z0, lls0 = results[0]
    z_dead, lls_dead = results[1]
    z1, _ = results[2]
    # a fully-masked spectrum yields a flat (all-zero) scan — the run
    # must survive it (degenerate grid-start argmax), and an
    # artificially all-NaN scan must come back as NaN, not raise
    assert np.isfinite(z_dead)
    assert np.allclose(lls_dead, 0.0)
    assert abs(z0 - z_trues[0]) < 0.1 and abs(z1 - z_trues[1]) < 0.1
    # matches the single-spectrum path
    z_single, lls_single, _ = inference_z_qso(learned, specs[0], params)
    assert z0 == z_single
    np.testing.assert_allclose(lls0, lls_single, rtol=1e-12)
    # keep_lls=False drops the big arrays
    results2, _ = inference_z_qso_many(
        learned, [specs[0]], params, keep_lls=False
    )
    assert results2[0][1] is None


def test_corr_scan_matches_shift_and_exact():
    """The all-shifts correlation scan (models/zqso_corr.py — FFT
    correlations instead of per-z table reads) must pick the same MAP z
    as the shift and exact scans, with near-peak deviations orders of
    magnitude below the peak's margin.  Its only approximations vs the
    shift scan are <=1-pixel mask edges (grid-rounded rest window,
    static strict observable cut) and f32 FFT accumulation."""
    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters(num_zqso_samples=800)
    learned = _z_learned()
    wl, flux, nv, pm = _observation(learned, z_true=3.2, seed=4)
    spec = prepare_z_spectrum(wl, flux, nv, pm, 5632)

    z_c, lls_c, zg = inference_z_qso(learned, spec, params, method="corr")
    z_s, lls_s, _ = inference_z_qso(learned, spec, params, method="shift")
    z_e, lls_e, _ = inference_z_qso(learned, spec, params, method="exact")
    assert z_c == z_s == z_e
    assert abs(z_c - 3.2) < 0.05

    fin = np.isfinite(lls_e) & np.isfinite(lls_c)
    peak = np.nanargmax(lls_e)
    near = fin & (np.abs(zg - zg[peak]) < 0.2)
    margin = lls_e[peak] - np.nanmax(
        np.where(
            np.abs(zg - zg[peak]) > 0.2,
            np.where(fin, lls_e, -np.inf),
            -np.inf,
        )
    )
    assert np.nanmax(np.abs(lls_c - lls_e)[near]) < 0.01 * margin
    # auto resolves to the corr path on a log-uniform grid
    z_a, lls_a, _ = inference_z_qso(learned, spec, params, method="auto")
    np.testing.assert_array_equal(lls_a, lls_c)
