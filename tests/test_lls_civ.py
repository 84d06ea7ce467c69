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


def test_lya_pdf_matches_reference_formula():
    """Our analytic data-driven logNHI prior equals the reference's
    quad-normalized flat-below-20.03 Garnett density
    (reference: gp_find_lls.py:325-351 LyaSamples._build_pdf)."""
    from scipy.integrate import quad

    from gpy_dla_detection_tpu.models.lls import lya_log_nhi_pdf

    un = lambda x: np.exp(-1.2695 * x**2 + 50.863 * x - 509.33)
    unnorm = lambda x: un(x) * (x >= 20.03) + un(20.03) * (x < 20.03)
    Z = quad(unnorm, 17.2, 23.0)[0]
    xs = np.linspace(17.3, 22.9, 25)
    np.testing.assert_allclose(
        lya_log_nhi_pdf(xs), [unnorm(x) / Z for x in xs], rtol=1e-7
    )
    # normalizes to 1 on the support
    grid = np.linspace(17.2, 23.0, 20001)
    np.testing.assert_allclose(
        np.trapezoid(lya_log_nhi_pdf(grid), grid), 1.0, rtol=1e-6
    )


def test_lya_samples_follow_data_driven_prior():
    from gpy_dla_detection_tpu.models.lls import (
        generate_lya_samples,
        lya_log_nhi_pdf,
    )

    s = generate_lya_samples(20000, prior="garnett")
    assert s.log_nhi_samples.min() >= 17.2
    assert s.log_nhi_samples.max() <= 23.0
    # histogram matches the analytic pdf
    hist, edges = np.histogram(
        s.log_nhi_samples, bins=24, range=(17.2, 23.0), density=True
    )
    centers = 0.5 * (edges[:-1] + edges[1:])
    want = lya_log_nhi_pdf(centers)
    np.testing.assert_allclose(hist, want, rtol=0.05, atol=5e-3)
    # the flat region is flat (it sits at the Garnett fit's peak value);
    # the density decays fast above the 20.03 peak
    flat = hist[centers < 19.8]
    np.testing.assert_allclose(flat, flat.mean(), rtol=0.05)
    assert hist[np.argmin(np.abs(centers - 21.6))] < 0.15 * flat.mean()


def test_lls_evidences_match_reference():
    """Oracle conformance: our LLS engine (break profile + QMC + the
    data-driven prior samples) vs the reference DLAGP engine configured
    exactly as LLSGPDR12 — the reference voigt_lls kernel inside the
    reference's sequential QMC loop (gp_find_lls.py:102-224), with the
    reference's resampling indices forced into our engine."""
    from gpy_dla_detection_tpu.models.lls import generate_lya_samples

    from .reference_oracle import import_reference

    import_reference()
    from gpy_dla_detection import voigt_lls
    from gpy_dla_detection.dla_gp import DLAGP as RefDLAGP
    from gpy_dla_detection.set_parameters import Parameters as RefParameters

    from .test_pipeline_conformance import _StubDLASamples, _StubPrior

    class RefLLSGP(RefDLAGP):
        """The LLSGPDR12 configuration (gp_find_lls.py:160-224): the
        DLAGP QMC engine with the Lyman-limit-break Voigt kernel."""

        def this_dla_gp(self, z_lls, nhis):
            mask_ind = ~self.pixel_mask[self.ind_unmasked]
            wavelengths = (
                self.padded_wavelengths
                if self.broadening
                else self.unmasked_wavelengths
            )
            absorption = voigt_lls.voigt_absorption(
                wavelengths,
                nhi=nhis[0],
                z_lls=z_lls[0],
                num_lines=self.params.num_lines,
                broadening=self.broadening,
            )
            for j in range(1, len(z_lls)):
                absorption = absorption * voigt_lls.voigt_absorption(
                    wavelengths,
                    nhi=nhis[j],
                    z_lls=z_lls[j],
                    num_lines=self.params.num_lines,
                    broadening=self.broadening,
                )
            absorption = absorption[mask_ind]
            return (
                self.this_mu * absorption,
                self.this_M * absorption[:, None],
                self.this_omega2 * absorption**2,
            )

    NUM, MAX_LYA, Z_QSO = 80, 2, 3.1
    params = Parameters(
        num_dla_samples=NUM, min_lambda=850.0, num_pixels_padded=1664
    )
    learned = synthetic_learned_model(params)
    samples = generate_lya_samples(NUM, prior="garnett")
    wl, fx, nv, pm = synthetic_observation(params, learned, Z_QSO, seed=11)

    ref_params = RefParameters(
        num_dla_samples=NUM, min_lambda=850.0
    )
    ref = RefLLSGP(
        ref_params,
        _StubPrior(),
        _StubDLASamples(samples, params),
        rest_wavelengths=learned.rest_wavelengths,
        mu=learned.mu,
        M=learned.M,
        log_omega=learned.log_omega,
        log_c_0=float(learned.log_c_0),
        log_tau_0=float(learned.log_tau_0),
        log_beta=float(learned.log_beta),
        prev_tau_0=float(learned.prev_tau_0),
        prev_beta=float(learned.prev_beta),
    )
    np.random.seed(0)
    ref.set_data(
        (wl / (1.0 + Z_QSO)).copy(), fx.copy(), nv.copy(), pm.copy(), Z_QSO
    )
    ref_null = ref.log_model_evidence()
    ref_evs = ref.log_model_evidences(MAX_LYA)

    spec = preprocess(wl, fx, nv, pm, Z_QSO, params)
    null_ev, result = lls_log_evidences(
        learned.astype(np.float64),
        spec,
        samples,
        jax.random.PRNGKey(0),
        MAX_LYA,
        params,
        base_inds_override=ref.base_sample_inds,
    )
    np.testing.assert_allclose(float(null_ev), ref_null, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(result.log_evidences), ref_evs, rtol=1e-7, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(result.sample_log_likelihoods),
        ref.sample_log_likelihoods,
        rtol=1e-6,
        atol=1e-4,
    )
    ref_map_z, ref_map_nhi = ref.maximum_a_posteriori()
    np.testing.assert_allclose(np.asarray(result.map_z_dlas), ref_map_z, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(result.map_log_nhis), ref_map_nhi, rtol=1e-10
    )


def test_lls_posteriors_with_catalog_priors():
    """Catalog-count posteriors follow the reference combination
    (gp_find_lls.py:757-767): softmax(evidence + prior) with the DLA
    P(k | z_qso) priors."""
    from scipy.special import logsumexp

    from gpy_dla_detection_tpu.models.selection import log_priors_k_dlas

    null_ev, evs = -100.0, np.array([-95.0, -101.0])
    m, n = 500, 5000
    post = lls_model_posteriors(null_ev, evs, num_dlas=m, num_quasars=n)
    lp = log_priors_k_dlas(m, n, 2)
    log_posts = np.concatenate(
        [[null_ev + np.log1p(-np.exp(logsumexp(lp)))], evs + lp]
    )
    want = np.exp(log_posts - logsumexp(log_posts))
    np.testing.assert_allclose(post, want / want.sum(), rtol=1e-10)
    # evidence gap e^5 beats the ~10:1 prior odds against an absorber
    assert post.argmax() == 1


def test_fumagalli_table_loader(tmp_path):
    """Whitespace table parser matches the reference loader's contract
    (reference: tests/test_selection_fumagalli.py:4-43)."""
    from gpy_dla_detection_tpu.models.lls import load_fumagalli_table

    path = tmp_path / "table_data_full.txt"
    header = "# header line\n" * 15
    rows = (
        "J0001+0001 10.5 -1.2 3.61 5.2 1 0 1 3.55\n"
        "J0002+0002 11.0 0.4 3.80 8.0 1 1 0 -1.0\n"
    )
    path.write_text(header + rows)
    t = load_fumagalli_table(str(path))
    assert t.quasar_name.tolist() == ["J0001+0001", "J0002+0002"]
    np.testing.assert_allclose(t.redshift, [3.61, 3.80])
    np.testing.assert_allclose(t.LLS_redshift, [3.55, -1.0])
    assert t.classification_outcome.tolist() == [1, 0]
    assert t.in_training_set.tolist() == [0, 1]


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


def test_lls_inference_many_matches_single_path():
    """The pipelined LLS many-path (bounded window, streamed iterable)
    must reproduce lls_log_evidences per spectrum."""
    from gpy_dla_detection_tpu.models.lls import (
        generate_lya_samples,
        lls_inference_many,
        lls_log_evidences,
    )

    params = Parameters(num_dla_samples=80, min_lambda=911.75)
    learned = synthetic_learned_model(params)
    samples = generate_lya_samples(80)
    specs = []
    for i, z in enumerate([3.0, 3.1, 3.2]):
        wl, fx, nv, pm = synthetic_observation(params, learned, z, seed=40 + i)
        specs.append(preprocess(wl, fx, nv, pm, z, params))

    key = jax.random.PRNGKey(9)
    outs = lls_inference_many(
        learned, iter(specs), samples, key, 2, params, max_in_flight=1
    )
    assert len(outs) == 3
    # single-spectrum path with the same per-spectrum key chain
    k = key
    for spec, (null_ev, result) in zip(specs, outs):
        k, sub = jax.random.split(k)
        ne_ref, res_ref = lls_log_evidences(
            learned, spec, samples, sub, 2, params
        )
        np.testing.assert_allclose(null_ev, float(ne_ref), rtol=1e-10)
        np.testing.assert_allclose(
            result.log_evidences, np.asarray(res_ref.log_evidences), rtol=1e-8
        )


def test_civ_inference_many_matches_single_path():
    """civ_inference_many (bounded window, streamed) must reproduce the
    eager per-spectrum evidences."""
    from gpy_dla_detection_tpu.models.civ import (
        civ_inference_many,
        civ_model_posterior,
        civ_null_log_evidence,
        civ_qmc_log_evidence,
        generate_civ_samples,
    )
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.params import CIVParameters

    params = CIVParameters(num_civ_samples=60)
    learned = synthetic_learned_model(params)
    samples = generate_civ_samples(params)
    specs = []
    for i, z in enumerate([2.1, 2.15, 2.2]):
        wl, fx, nv, pm = synthetic_observation(params, learned, z, seed=50 + i)
        specs.append(preprocess(wl, fx, nv, pm, z, params))

    results = civ_inference_many(
        learned, iter(specs), samples, params, max_in_flight=1
    )
    assert len(results) == 3
    for spec, (p_civ, ne, ce) in zip(specs, results):
        model = build_spectrum_model(learned, spec, params)
        model = model._replace(omega2=jnp.zeros_like(model.v))
        ne_ref = float(civ_null_log_evidence(model))
        ce_ref, _ = civ_qmc_log_evidence(model, samples, params)
        np.testing.assert_allclose(ne, ne_ref, rtol=1e-8)
        np.testing.assert_allclose(ce, float(ce_ref), rtol=1e-8)
        np.testing.assert_allclose(
            p_civ, civ_model_posterior(ne_ref, float(ce_ref)), rtol=1e-8
        )
