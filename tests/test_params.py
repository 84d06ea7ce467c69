"""Parameters: constants, unit conversions, search ranges vs reference."""

import numpy as np
import pytest

from gpy_dla_detection_tpu.params import CIVParameters, Parameters, ZParameters

from .reference_oracle import import_reference


def test_constants_and_conversions():
    p = Parameters()
    assert p.lya_wavelength == pytest.approx(1215.6701)
    assert p.lyman_limit == pytest.approx(911.7633)
    # kms_to_z round trip (reference: tests/test_set_parameters.py)
    assert p.kms_to_z(3000.0) == pytest.approx(3000e3 / 299792458.0)
    wl = np.array([4000.0, 5000.0])
    np.testing.assert_allclose(
        p.observed_wavelengths(p.emitted_wavelengths(wl, 2.5), 2.5), wl
    )


def test_search_range_matches_reference():
    import_reference()
    from gpy_dla_detection.set_parameters import Parameters as RefParameters

    p = Parameters()
    rp = RefParameters()
    wl = 3600.0 * 10 ** (1e-4 * np.arange(4000))
    for z in [2.3, 3.1, 4.5]:
        assert p.min_z_dla(wl, z) == pytest.approx(rp.min_z_dla(wl, z), rel=1e-12)
        assert p.max_z_dla(wl, z) == pytest.approx(rp.max_z_dla(wl, z), rel=1e-12)
    assert p.prior_z_qso_increase == pytest.approx(rp.prior_z_qso_increase)
    assert p.min_z_cut == pytest.approx(rp.min_z_cut)


def test_params_hashable_and_frozen():
    p = Parameters()
    assert hash(p) == hash(Parameters())
    assert hash(Parameters(num_dla_samples=5)) != hash(p)
    with pytest.raises(Exception):
        p.k = 3  # frozen


def test_civ_search_range_matches_reference():
    import_reference()
    from gpy_dla_detection.civ_set_parameter import CIVParameters as RefCIV

    p = CIVParameters()
    rp = RefCIV()
    wl = 4000.0 * 10 ** (1e-4 * np.arange(2500))
    for z in [1.9, 2.2]:
        assert p.min_z_civ(wl, z) == pytest.approx(rp.min_z_civ(wl, z), rel=1e-12)
        assert p.max_z_civ(wl, z) == pytest.approx(rp.max_z_civ(wl, z), rel=1e-12)


def test_zparams_window():
    zp = ZParameters()
    assert zp.min_lambda == 910.0 and zp.max_lambda == 3000.0
    assert zp.normalization_min_lambda == 1176.0


def test_civ_search_range_uses_doublet_wavelength():
    """The generic preprocessing asks Parameters for the absorber search
    range; CIVParameters must answer with the doublet's range, not
    Lyman-alpha's (regression: an injected doublet at z=2.05 landed
    outside the search range and the CLI returned P(CIV|D)=0.5)."""
    import numpy as np

    from gpy_dla_detection_tpu.params import CIVParameters

    p = CIVParameters()
    z_qso = 2.2
    wl = 1311.0 * (1 + z_qso) * 10 ** (1e-4 * np.arange(700))
    lo, hi = p.min_z_dla(wl, z_qso), p.max_z_dla(wl, z_qso)
    assert lo == p.min_z_civ(wl, z_qso)
    assert hi == p.max_z_civ(wl, z_qso)
    # the range must bracket a mid-window doublet redshift
    assert lo < 2.05 < hi
    # and differ from the (nonsensical here) lya-based range
    assert abs(lo - (np.min(wl) / p.lya_wavelength - 1.0)) > 0.3
