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


def test_garnett2017_preset():
    """The 2017 single-DLA settings as a named preset
    (reference: set_parameters.m:37,49; process_qsos.m:138-147)."""
    import numpy as np

    from gpy_dla_detection_tpu.params import Parameters

    p17 = Parameters.garnett2017()
    assert p17.alpha == 0.9
    assert p17.max_noise_variance == 1.0
    assert p17.num_forest_lines == 1
    assert p17.suppress_mean_flux is False
    # overrides compose
    assert Parameters.garnett2017(num_dla_samples=500).num_dla_samples == 500
    # 2020 defaults unchanged (reference: multi_dlas/set_parameters_multi.m:37,49)
    p20 = Parameters()
    assert (p20.alpha, p20.max_noise_variance) == (0.97, 9.0)
    assert p20.suppress_mean_flux is True

    # the preset changes the model build: no mean-flux suppression of
    # mu/M, omega2 scaled by the learned factor only
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.ops.optical_depth import effective_optical_depth

    learned = synthetic_learned_model(p20)
    wl, fx, nv, pm = synthetic_observation(p20, learned, 3.0, seed=3)
    spec = preprocess(wl, fx, nv, pm, 3.0, p20)
    m20 = build_spectrum_model(learned, spec, p20)
    m17 = build_spectrum_model(learned, spec, p17)

    wavelengths = np.asarray(spec.padded_wavelengths)[3:-3]
    tau_kim = effective_optical_depth(
        jnp.asarray(wavelengths), learned.prev_beta, learned.prev_tau_0,
        jnp.asarray(3.0), p20.num_forest_lines,
    )
    a_lya = np.exp(-np.asarray(jnp.sum(tau_kim, axis=-1)))

    valid = np.asarray(spec.mask)
    # 2020 mu = 2017 mu * a_lya (2017 mu is unsuppressed)
    np.testing.assert_allclose(
        np.asarray(m20.mu)[valid], (np.asarray(m17.mu) * a_lya)[valid], rtol=1e-5
    )
    assert np.any(a_lya[valid] < 0.999)  # suppression actually bites
    # 2017 omega2 carries no a_lya^2 factor, and its single-line learned
    # scaling differs from the 31-line one
    assert not np.allclose(
        np.asarray(m17.omega2)[valid], np.asarray(m20.omega2)[valid]
    )

    # evidence deltas: pinned on synthetic data so the preset's effect
    # is locked in (values recomputed, tolerance loose)
    from gpy_dla_detection_tpu.models.evidence import null_log_evidence

    e20 = float(null_log_evidence(m20))
    e17 = float(null_log_evidence(m17))
    assert np.isfinite(e17) and np.isfinite(e20)
    assert e17 != e20
