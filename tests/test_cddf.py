"""CDDF analysis engine: Poisson-binomial machinery vs the reference
functions, and an end-to-end statistics sanity check."""

import numpy as np
import pytest

from gpy_dla_detection_tpu.analysis.cddf import (
    ProcessedCatalog,
    combine_with_poisson,
    interval,
    path_length_integrand,
    pdf_confidence,
    poisson_binomial_pdf,
)

from .reference_oracle import import_reference


def _ref_cddf_module():
    import_reference()
    import sys
    import types

    # CDDF_analysis imports matplotlib with pdf backend; safe here
    from CDDF_analysis import calc_cddf

    return calc_cddf


def test_poisson_binomial_matches_reference_and_binomial():
    ref = _ref_cddf_module()
    rng = np.random.default_rng(0)
    pp = [rng.uniform(0.3, 0.95, size=7), rng.uniform(0.25, 0.8, size=4)]
    got = poisson_binomial_pdf(pp)
    # the reference chokes on ragged lists under numpy 2.x; feed it the
    # concatenated probabilities (same distribution)
    want = ref.get_poisson_binomial_pdf([np.concatenate(pp)])
    np.testing.assert_allclose(got, want, atol=1e-10)

    # equal p's reduce to the binomial distribution
    from scipy.stats import binom

    p = 0.4
    got = poisson_binomial_pdf([np.full(12, p)])
    np.testing.assert_allclose(got, binom.pmf(np.arange(13), 12, p), atol=1e-10)


def test_interval_and_confidence_match_reference():
    ref = _ref_cddf_module()
    pdf = np.array([0.05, 0.1, 0.2, 0.3, 0.2, 0.1, 0.05])
    cdf = np.cumsum(pdf)
    for level in [0.0, 0.68, 0.95]:
        assert interval(cdf, level, offset=3) == ref.interval(cdf, level, offset=3)
    assert pdf_confidence(pdf, 2) == ref.pdf_confidence(pdf, 2)


def test_path_length_integrand_matches_reference():
    ref = _ref_cddf_module()
    zs = np.linspace(0.0, 6.0, 13)
    got = [float(path_length_integrand(z)) for z in zs]
    want = [ref.path_length_int(z) for z in zs]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_combine_with_poisson_normalized():
    pdf = poisson_binomial_pdf([np.array([0.9, 0.8, 0.6])])
    comb, offset = combine_with_poisson(pdf, 2.5)
    assert 0.99 < comb.sum() < 1.01
    assert offset >= 0


def _toy_catalog(num_spec=40, S=500, seed=0):
    """A catalog where each 'detected' spectrum has its likelihood mass
    on one known sample -> statistics are analytically checkable."""
    rng = np.random.default_rng(seed)
    z_min = np.full(num_spec, 2.0)
    z_max = np.full(num_spec, 3.5)
    offsets = rng.uniform(size=S)
    lnhi = rng.uniform(20.0, 22.5, size=S)

    sll = np.full((num_spec, S, 1), -200.0)
    p_dla = np.zeros(num_spec)
    picked = rng.integers(0, S, size=num_spec)
    detected = rng.uniform(size=num_spec) < 0.5
    for i in range(num_spec):
        if detected[i]:
            sll[i, picked[i], 0] = 0.0
            p_dla[i] = 0.95
        else:
            p_dla[i] = 1e-4
    # log evidence consistent with the normalization convention:
    # log_norm_like = sll - (log_ev + log S) must satisfy
    # sum exp(log_norm_like) ~= 1  ->  log_ev = logsumexp(sll) - log S
    from scipy.special import logsumexp

    log_ev = logsumexp(sll[:, :, 0], axis=1)[:, None] - np.log(S)

    mp = np.stack(
        [1 - p_dla - 1e-5, np.full(num_spec, 1e-5), p_dla], axis=1
    )
    base = np.zeros((num_spec, S, 0), dtype=np.int32)
    cat = ProcessedCatalog(
        z_min,
        z_max,
        mp,
        sll,
        log_ev,
        base,
        offsets,
        lnhi,
        sub_dla=True,
        max_k=1,
    )
    return cat, detected, picked, offsets, lnhi


def test_catalog_statistics_sane():
    cat, detected, picked, offsets, lnhi = _toy_catalog()

    # expected number of DLAs in the full range ~ number of detections
    # with lnhi > 20.3
    z = 2.0 + 1.5 * offsets
    true_n = sum(
        1
        for i in range(len(detected))
        if detected[i] and lnhi[picked[i]] > 20.3 and 2.0 < z[picked[i]] < 3.5
    )
    maxlike, l68, l95 = cat.confidence_intervals(
        q_bins=np.array([2.0, 3.5]), lred=2.0, ured=3.5, lnhi_min=20.3
    )
    assert abs(maxlike[0] - true_n) <= 2, (maxlike, true_n)
    assert l95[0][0] <= maxlike[0] <= l95[0][1]

    # line density is positive and finite
    z_cent, dNdX, dndx68, dndx95, xerrs = cat.line_density(2.0, 3.5)
    assert np.all(np.isfinite(dNdX)) and np.all(dNdX >= 0)

    # CDDF integrates to roughly the detected number
    l_cent, cddf, cddf68, cddf95, xerrs = cat.column_density_function(
        2.0, 3.5, lnhi_nbins=10, lnhi_min=20.3, lnhi_max=23.0
    )
    dX = cat.path_length(2.0, 3.5)
    dN = 10.0 ** np.linspace(20.3, 23.0, 11)
    total = np.sum(cddf * np.diff(dN)) * dX
    assert abs(total - true_n) <= 3, (total, true_n)

    # omega_dla positive
    z_cent, omega, omega_err = cat.omega_dla(2.0, 3.5)
    assert np.all(omega >= 0) and np.all(np.isfinite(omega))


def test_omega_dla_cddf_consistent_with_direct():
    """The CDDF-summed Omega_DLA should agree with the direct-sum
    estimate within its own confidence interval."""
    cat, detected, picked, offsets, lnhi = _toy_catalog(num_spec=30, S=300, seed=2)
    z_cent_d, omega_d, omega_err = cat.omega_dla(2.0, 3.5)
    z_cent_c, omega_c, o68, o95, xerrs = cat.omega_dla_cddf(2.0, 3.5)
    assert omega_c.shape[0] == o68.shape[0] == o95.shape[0]
    for i in range(len(z_cent_c)):
        assert o95[i, 0] <= omega_c[i] <= o95[i, 1] or omega_c[i] == 0.0
    # bins with detections: the two estimators agree to ~the error bar
    for i in range(min(len(omega_d), len(omega_c))):
        if omega_d[i] > 0 and omega_c[i] > 0:
            assert abs(omega_d[i] - omega_c[i]) < 4 * (omega_err[i] + 1e-30)


def test_path_length_noisy_pixel_filtering():
    """Pixel-noise filtering removes path where noise exceeds the
    threshold (reference: calc_cddf.py:605-657)."""
    from scipy import integrate as _int

    from gpy_dla_detection_tpu.analysis.cddf import path_length_integrand

    cat, *_ = _toy_catalog(num_spec=4, S=50, seed=5)
    full = cat.path_length(2.0, 3.5)

    # half of each spectrum's pixels too noisy -> about half the path
    P = 100
    pn = [np.where(np.arange(P) < P // 2, 0.01, 1.0) for _ in range(4)]
    cat.pixel_noise = pn
    cat.noise_thresh = 0.25
    cat.filter_noisy_pixels = True
    filtered = cat.path_length(2.0, 3.5)
    assert filtered < 0.6 * full
    # expected: integral over the first half of each z range
    zmid = 2.0 + (3.5 - 2.0) * (P // 2 - 1) / (P - 1)
    expect = 4 * _int.quad(path_length_integrand, 2.0, zmid)[0]
    np.testing.assert_allclose(filtered, expect, rtol=0.02)


def test_from_file_reference_matlab_layout(tmp_path):
    """from_file must load a reference-driver catalog: MATLAB-ordered
    arrays ((k, S, Q) / (k, Q) / transposed vectors) and 1-BASED
    base_sample_inds (the reference subtracts 1 on load,
    calc_cddf.py:392-404) — and give identical per-sample statistics to
    the same catalog in this framework's native layout."""
    import h5py

    rng = np.random.default_rng(5)
    Q, S, K = 7, 40, 3
    min_z = np.full(Q, 2.0)
    max_z = np.full(Q, 3.5)
    sll = rng.normal(-50.0, 5.0, (Q, S, K))
    lld = rng.normal(-40.0, 3.0, (Q, K))
    mp = rng.uniform(0.01, 1.0, (Q, 2 + K))
    mp /= mp.sum(axis=1, keepdims=True)
    base0 = rng.integers(0, S, (Q, S, K - 1)).astype(np.int64)
    offsets = rng.uniform(size=S)
    lnhi = rng.uniform(20.0, 22.5, size=S)

    sample_file = str(tmp_path / "samples.h5")
    with h5py.File(sample_file, "w") as f:
        f["offset_samples"] = offsets[:, None]
        f["log_nhi_samples"] = lnhi[:, None]

    native = str(tmp_path / "native.h5")
    matlab = str(tmp_path / "matlab.h5")
    with h5py.File(native, "w") as f:
        f["min_z_dlas"], f["max_z_dlas"] = min_z, max_z
        f["sample_log_likelihoods_dla"] = sll
        f["log_likelihoods_dla"] = lld
        f["model_posteriors"] = mp
        f["base_sample_inds"] = base0
    with h5py.File(matlab, "w") as f:  # as h5py reads a v7.3 .mat
        f["min_z_dlas"], f["max_z_dlas"] = min_z[None, :], max_z[None, :]
        f["sample_log_likelihoods_dla"] = sll.T  # (K, S, Q)
        f["log_likelihoods_dla"] = lld.T  # (K, Q)
        f["model_posteriors"] = mp.T
        f["base_sample_inds"] = base0.T + 1  # (K-1, S, Q), 1-based

    cat_n = ProcessedCatalog.from_file(native, sample_file, max_k=K)
    cat_m = ProcessedCatalog.from_file(matlab, sample_file, max_k=K)
    np.testing.assert_array_equal(cat_m.base_sample_inds, base0)
    for spec in range(Q):
        for second in range(K):
            ln_n, z_n = cat_n.sample_params(spec, second)
            ln_m, z_m = cat_m.sample_params(spec, second)
            np.testing.assert_allclose(np.asarray(ln_m), np.asarray(ln_n))
            np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_n))
