"""Ensemble MCMC: correctness on a known Gaussian target and a smoke
run of the DLA parameter sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from gpy_dla_detection_tpu.models.mcmc import autocorrelation_time, run_ensemble


def test_ensemble_samples_gaussian():
    """The stretch move must reproduce the moments of an anisotropic
    2-D Gaussian."""
    mean = jnp.asarray([1.0, -2.0])
    std = jnp.asarray([0.7, 2.5])

    def log_prob(x):  # (W, 2) -> (W,)
        return -0.5 * jnp.sum(((x - mean) / std) ** 2, axis=-1)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pos0 = mean + 0.1 * jax.random.normal(k1, (64, 2))
    chain, lps, acc = run_ensemble(k2, pos0, log_prob, num_steps=2000)

    assert 0.2 < float(acc) < 0.9, float(acc)
    samples = np.asarray(chain[500:]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(0), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(samples.std(0), np.asarray(std), rtol=0.08)


def test_autocorrelation_time_reasonable():
    rng = np.random.default_rng(0)
    # AR(1) with known tau = (1+rho)/(1-rho)
    rho = 0.9
    x = np.zeros(20000)
    for i in range(1, len(x)):
        x[i] = rho * x[i - 1] + rng.normal()
    tau = autocorrelation_time(x)
    want = (1 + rho) / (1 - rho)
    assert 0.5 * want < tau < 2.0 * want, (tau, want)


def test_dla_mcmc_smoke():
    """32-walker DLA sampler runs and concentrates near the injected
    absorber (reference smoke test: tests/test_mcmc.py:8-15)."""
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.models.absorber_mcmc import run_dla_mcmc
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()
    learned = synthetic_learned_model(params)
    z_dla, log_nhi = 2.82, 21.0
    wl, fx, nv, pm = synthetic_observation(
        params, learned, 3.05, seed=11, dlas=[(z_dla, log_nhi)], noise_level=0.05
    )
    spec = preprocess(wl, fx, nv, pm, 3.05, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)

    # start walkers near the absorber (as the reference seeds its
    # walkers from the QMC likelihood draws, dla_gp.py:289-304) — the
    # k=1 posterior is a needle in a mostly-flat landscape and a global
    # search is not what this test checks
    key = jax.random.PRNGKey(1)
    k0, key = jax.random.split(key)
    pos0 = jnp.stack(
        [
            z_dla + 0.01 * jax.random.normal(k0, (16,)),
            log_nhi + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (16,)),
        ],
        axis=1,
    )
    chain, lps, acc = run_dla_mcmc(
        model,
        params,
        key,
        k_dlas=1,
        nwalkers=16,
        nsamples=400,
        initial_positions=pos0,
    )
    assert np.isfinite(np.asarray(lps[-1])).all()
    assert 0.05 < float(acc) < 0.95, float(acc)
    tail = np.asarray(chain[-100:]).reshape(-1, 2)
    assert abs(np.median(tail[:, 0]) - z_dla) < 0.01, np.median(tail[:, 0])
    assert abs(np.median(tail[:, 1]) - log_nhi) < 0.3, np.median(tail[:, 1])


def test_dla_log_posterior_matches_reference():
    """Our vmapped DLA log posterior equals the reference's
    log_posterior_mcmc.log_posterior on identical data."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import import_reference

    import_reference()
    from gpy_dla_detection.log_posterior_mcmc import log_posterior as ref_log_posterior
    from scipy import stats
    from scipy.integrate import quad

    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.models.absorber_mcmc import make_dla_log_posterior
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()
    learned = synthetic_learned_model(params)
    z_qso = 3.05
    wl, fx, nv, pm = synthetic_observation(params, learned, z_qso, seed=7, dlas=[(2.8, 20.8)])
    spec = preprocess(wl, fx, nv, pm, z_qso, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)

    log_prob = make_dla_log_posterior(model, params, k_dlas=1)

    # reference needs its set_data state: rebuild via the reference class
    from gpy_dla_detection.dla_gp import DLAGP
    from gpy_dla_detection.set_parameters import Parameters as RefParameters

    ref_gp = DLAGP(
        RefParameters(), None, None,
        rest_wavelengths=learned.rest_wavelengths, mu=learned.mu, M=learned.M,
        log_omega=learned.log_omega, log_c_0=float(learned.log_c_0),
        log_tau_0=float(learned.log_tau_0), log_beta=float(learned.log_beta),
    )
    ref_gp.set_data(wl / (1 + z_qso), fx.copy(), nv.copy(), pm.copy(), z_qso)

    # the reference's normalized logNHI pdf (dla_gp.py:249-263)
    u = stats.uniform(loc=20.0, scale=3.0)
    unnorm = lambda x: np.exp(-1.2695 * x**2 + 50.863 * x - 509.33)
    Z = quad(unnorm, 20.0, 25.0)[0]
    pdf = lambda x: 0.97 * unnorm(x) / Z + 0.03 * u.pdf(x)

    min_z = params.min_z_dla(ref_gp.this_wavelengths, z_qso)
    max_z = params.max_z_dla(ref_gp.this_wavelengths, z_qso)

    thetas = np.array([[2.8, 20.8], [2.5, 21.5], [2.2, 20.1], [3.0, 22.0]])
    got = np.asarray(log_prob(jnp.asarray(thetas)))
    for i, (z_dla, log_nhi) in enumerate(thetas):
        want = ref_log_posterior(
            (z_dla, log_nhi),
            ref_gp.this_wavelengths, ref_gp.y, ref_gp.v, z_qso,
            min_z, max_z, 20.0, 23.0, pdf,
            ref_gp.padded_wavelengths, ref_gp.this_mu, ref_gp.this_M,
            ref_gp.this_omega2, ref_gp.pixel_mask, ref_gp.ind_unmasked, 3,
        )
        np.testing.assert_allclose(got[i], want, rtol=1e-7, atol=1e-3)

    # out of bounds -> -inf on both sides
    oob = np.asarray(log_prob(jnp.asarray([[min_z - 0.1, 20.8]])))
    assert np.isneginf(oob[0])
