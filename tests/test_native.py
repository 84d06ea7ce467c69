"""Native C++ kernels vs scipy and the Python/JAX implementations."""

import numpy as np
import pytest

native = pytest.importorskip("gpy_dla_detection_tpu.native")


@pytest.fixture(scope="module", autouse=True)
def _built():
    try:
        native.load()
    except Exception as e:  # no toolchain
        pytest.skip(f"native build unavailable: {e}")


def test_native_faddeeva_matches_scipy():
    from scipy.special import wofz

    x = np.concatenate([np.linspace(-10, 10, 201), np.logspace(1, 4, 101)])
    y = np.full_like(x, 4.72e-4)
    ref = wofz(x + 1j * y).real
    got = native.faddeeva_real(x, y)
    np.testing.assert_allclose(got, ref, rtol=2e-9)


def test_native_voigt_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from gpy_dla_detection import voigt as ref_voigt

    wl = 3600.0 * 10 ** (1e-4 * np.arange(1000))
    nhi = np.array([10**20.3, 10**21.5])
    z = np.array([2.5, 3.0])
    got = native.voigt_absorption(wl, nhi, z, num_lines=3)
    for i in range(2):
        ref = ref_voigt.voigt_absorption(wl, float(nhi[i]), float(z[i]), 3)
        np.testing.assert_allclose(got[i], ref, atol=1e-8, rtol=1e-6)


def test_native_preprocess_matches_python():
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()
    learned = synthetic_learned_model(params)
    wl, fx, nv, pm = synthetic_observation(params, learned, 3.1, seed=5)

    py = preprocess(wl, fx, nv, pm, 3.1, params)
    nat = native.preprocess_spectrum(wl, fx, nv, pm, 3.1, params)

    np.testing.assert_allclose(nat.padded_wavelengths, py.padded_wavelengths, rtol=1e-12)
    np.testing.assert_allclose(nat.flux, py.flux, rtol=1e-12)
    np.testing.assert_allclose(nat.noise_variance, py.noise_variance, rtol=1e-12)
    assert np.array_equal(nat.mask, py.mask)
    np.testing.assert_allclose(float(nat.normalization_median), float(py.normalization_median), rtol=1e-12)
    np.testing.assert_allclose(float(nat.min_z_dla), float(py.min_z_dla), rtol=1e-12)
    np.testing.assert_allclose(float(nat.max_z_dla), float(py.max_z_dla), rtol=1e-12)
