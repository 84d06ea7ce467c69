"""LLS finder and CIV QMC evidence."""

import numpy as np
import jax
import jax.numpy as jnp

from gpy_dla_detection_tpu.data.spectrum import preprocess
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model,
    synthetic_observation,
)
from gpy_dla_detection_tpu.models.lls import (
    generate_lya_samples,
    lls_log_evidences,
    lls_model_posteriors,
    with_boss_meanflux,
)
from gpy_dla_detection_tpu.params import Parameters


def test_lls_uses_break_profile():
    """The LLS evidence must differ from the DLA evidence on the same
    samples (the Lyman-limit break changes the profile) and the engine
    must run end to end."""
    from gpy_dla_detection_tpu.models.evidence import qmc_log_evidences
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model

    # extend the model window below the Lyman limit: with the standard
    # 911.75 A window the break of any z_lls < z_qso absorber falls
    # blueward of every modelled pixel and LLS == DLA profiles exactly
    # (the reference's LLS finder also uses its own bluer window)
    params = Parameters(num_dla_samples=100, min_lambda=850.0, num_pixels_padded=1664)
    learned = synthetic_learned_model(params)
    wl, fx, nv, pm = synthetic_observation(params, learned, 3.1, seed=3)
    spec = preprocess(wl, fx, nv, pm, 3.1, params)

    samples = generate_lya_samples(100, 17.2, 23.0)
    null_ev, result = lls_log_evidences(
        learned, spec, samples, jax.random.PRNGKey(0), 2, params
    )
    assert np.isfinite(float(null_ev))
    assert np.isfinite(np.asarray(result.log_evidences)).all()

    model = build_spectrum_model(learned.astype(np.float64), spec, params)
    dla_result = qmc_log_evidences(
        model,
        jnp.asarray(samples.offset_samples),
        jnp.asarray(samples.log_nhi_samples),
        jnp.asarray(samples.nhi_samples),
        jax.random.PRNGKey(0),
        1,
        params,
        profile="dla",
    )
    # samples with z_lls high enough that the break falls inside the
    # window must have materially different likelihoods; others identical
    lls_ll = np.asarray(result.sample_log_likelihoods[:, 0])
    dla_ll = np.asarray(dla_result.sample_log_likelihoods[:, 0])
    z_s = float(spec.min_z_dla) + (
        float(spec.max_z_dla) - float(spec.min_z_dla)
    ) * samples.offset_samples
    window_min = float(np.asarray(spec.padded_wavelengths)[3])
    has_break = 911.7641 * (1.0 + z_s) > window_min
    assert np.any(has_break)
    assert np.max(np.abs(lls_ll[has_break] - dla_ll[has_break])) > 1.0
    np.testing.assert_allclose(lls_ll[~has_break], dla_ll[~has_break], rtol=1e-10)

    post = lls_model_posteriors(float(null_ev), np.asarray(result.log_evidences))
    np.testing.assert_allclose(post.sum(), 1.0, rtol=1e-10)


def test_boss_meanflux_swap():
    params = Parameters()
    learned = synthetic_learned_model(params)
    boss = with_boss_meanflux(learned)
    assert float(boss.prev_tau_0) == 0.00554
    assert float(boss.prev_beta) == 3.182
    assert float(learned.prev_tau_0) == 0.0023


def test_civ_qmc_evidence_detects_doublet():
    """Inject a CIV doublet into a synthetic spectrum; the CIV evidence
    must beat the null evidence (the reference left this computation
    unimplemented, civ_gp.py:248-250)."""
    from scipy.special import wofz

    from gpy_dla_detection_tpu import constants as C
    from gpy_dla_detection_tpu.models.civ import (
        civ_model_posterior,
        civ_null_log_evidence,
        civ_qmc_log_evidence,
        generate_civ_samples,
    )
    from gpy_dla_detection_tpu.models.learned import SpectrumModel
    from gpy_dla_detection_tpu.params import CIVParameters

    params = CIVParameters(num_civ_samples=600, num_pixels_padded=768)
    rng = np.random.default_rng(0)
    z_qso = 2.2

    # flat-continuum synthetic spectrum over the CIV window
    n = 700
    wl = 1311.0 * (1 + z_qso) * 10 ** (1e-4 * np.arange(n + 6))
    mu = np.ones(n)
    M = np.stack([np.sin(np.arange(n) / 40.0 + i) * 0.05 for i in range(5)], axis=1)
    v = np.full(n, 0.03**2)
    flux = mu + M @ rng.normal(size=5) + np.sqrt(v) * rng.normal(size=n)

    # inject the doublet at z_civ
    z_civ, log_n, sig = 2.05, 14.2, 2.5e6
    tau = np.zeros(n + 6)
    for l in range(2):
        lam_c = C.CIV_WAVELENGTHS_CM[l] * 1e8 * (1 + z_civ)
        vel = (wl - lam_c) * (C.SPEED_OF_LIGHT_CGS / lam_c)
        zz = (vel + 1j * C.CIV_LORENTZIAN_WIDTHS[l]) / (np.sqrt(2) * sig)
        tau += (
            10.0**log_n
            * C.CIV_LEADING_CONSTANTS[l]
            * np.real(wofz(zz))
            / (np.sqrt(2 * np.pi) * sig)
        )
    absorption = np.convolve(np.exp(-tau), C.INSTRUMENT_PROFILE, "valid")
    flux_with = flux * absorption

    pad = 768 - n
    model = SpectrumModel(
        padded_wavelengths=jnp.asarray(
            np.concatenate([wl, wl[-1] * 10 ** (1e-4 * np.arange(1, pad + 1))])
        ),
        y=jnp.asarray(np.concatenate([flux_with, np.zeros(pad)])),
        v=jnp.asarray(np.concatenate([v, np.ones(pad)])),
        mask=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
        mu=jnp.asarray(np.concatenate([mu, np.zeros(pad)])),
        M=jnp.asarray(np.vstack([M, np.zeros((pad, 5))])),
        omega2=jnp.zeros(768),
        z_qso=jnp.asarray(z_qso),
        min_z_dla=jnp.asarray(1.95),
        max_z_dla=jnp.asarray(2.17),
    )

    samples = generate_civ_samples(params)
    null_ev = float(civ_null_log_evidence(model))
    civ_ev, lls = civ_qmc_log_evidence(model, samples, params)
    civ_ev = float(civ_ev)
    assert civ_ev > null_ev + 5.0, (civ_ev, null_ev)
    assert civ_model_posterior(null_ev, civ_ev) > 0.99

    # MAP sample should sit near the injected parameters
    best = int(np.argmax(np.asarray(lls)))
    z_best = 1.95 + (2.17 - 1.95) * samples.offset_samples[best]
    assert abs(z_best - z_civ) < 0.01, z_best
    assert abs(samples.log_nciv_samples[best] - log_n) < 0.6
