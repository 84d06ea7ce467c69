"""Effective optical depth vs the reference implementation."""

import numpy as np

from gpy_dla_detection_tpu.ops.optical_depth import (
    effective_optical_depth,
    mean_flux_suppression,
)

from .reference_oracle import import_reference


def test_effective_optical_depth_matches_reference():
    import_reference()
    from gpy_dla_detection.effective_optical_depth import (
        effective_optical_depth as ref_eod,
    )

    wl = 3800.0 * 10 ** (1e-4 * np.arange(900))
    for beta, tau0, z_qso, L in [(3.65, 0.0023, 3.16, 31), (3.182, 0.00554, 2.5, 31), (3.65, 0.0023, 4.2, 5)]:
        ref = ref_eod(wl, beta, tau0, z_qso, L)
        got = np.asarray(effective_optical_depth(wl, beta, tau0, z_qso, L))
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-300)


def test_mean_flux_suppression_range():
    wl = 3800.0 * 10 ** (1e-4 * np.arange(500))
    a = np.asarray(mean_flux_suppression(wl, 3.65, 0.0023, 3.0, 31))
    assert np.all(a > 0.0) and np.all(a <= 1.0)


def test_interp_matches_scipy():
    from scipy.interpolate import interp1d as scipy_interp1d

    from gpy_dla_detection_tpu.ops.interp import interp, interp_uniform

    rng = np.random.default_rng(0)
    xg = 911.75 + 0.25 * np.arange(1217)
    f = rng.normal(size=(1217, 3))
    xq = rng.uniform(xg[0], xg[-1], size=200)

    ref = scipy_interp1d(xg, f, axis=0)(xq)
    np.testing.assert_allclose(np.asarray(interp_uniform(xg[0], 0.25, f, xq)), ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(interp(xg, f, xq)), ref, rtol=1e-9, atol=1e-12)
