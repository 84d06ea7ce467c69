"""CIV doublet detection + MCMC demo on a synthetic spectrum.

Script twin of the reference's "GP CIV using MCMC.ipynb" notebook: build
a CIV-window GP, inject a CIV doublet, run the QMC evidence (which the
reference notebook could not — reference: civ_gp.py:248-250 left it as
TODO) and the vmapped affine-invariant ensemble MCMC, then save the
corner plot and posterior-draw figure.

Run:  python examples/civ_mcmc_demo.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(outdir="/tmp/civ_demo"):
    import jax

    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.models.absorber_mcmc import run_civ_mcmc
    from gpy_dla_detection_tpu.models.civ import (
        civ_model_posterior,
        civ_null_log_evidence,
        civ_qmc_log_evidence,
        generate_civ_samples,
    )
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.models.mcmc import autocorrelation_time
    from gpy_dla_detection_tpu.ops.voigt import voigt_absorption_civ
    from gpy_dla_detection_tpu.params import CIVParameters
    from gpy_dla_detection_tpu.plotting import plot_corner

    os.makedirs(outdir, exist_ok=True)
    params = CIVParameters(num_civ_samples=2000)
    z_qso = 2.1
    z_civ_true, log_nciv_true, sigma_true = 1.85, 14.5, 2.4e6

    learned = synthetic_learned_model(params)
    wl, flux, nv, pm = synthetic_observation(params, learned, z_qso, seed=0)
    absorption = np.asarray(
        voigt_absorption_civ(
            wl,
            np.array([10.0**log_nciv_true]),
            np.array([z_civ_true]),
            np.array([sigma_true]),
            broadening=False,
        )
    )[0]
    flux = flux * absorption

    spec = preprocess(wl, flux, nv, pm, z_qso, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)
    # the CIV covariance carries no absorption-noise term
    # (reference: civ_gp.py:158-183)
    model = model._replace(omega2=np.zeros_like(np.asarray(model.v)))

    samples = generate_civ_samples(params)
    null_ev = float(civ_null_log_evidence(model))
    civ_ev, _ = civ_qmc_log_evidence(model, samples, params)
    p_civ = civ_model_posterior(null_ev, float(civ_ev))
    print(f"P(CIV | D) = {p_civ:.4f}   (truth: doublet at z={z_civ_true})")

    chain, log_probs, acc = run_civ_mcmc(
        model, params, jax.random.PRNGKey(0), nsamples=2000
    )
    tail = np.asarray(chain[-500:]).reshape(-1, 3)
    print(
        f"MCMC medians: z = {np.median(tail[:, 0]):.4f} "
        f"(true {z_civ_true}), logN = {np.median(tail[:, 1]):.3f} "
        f"(true {log_nciv_true}), sigma = {np.median(tail[:, 2]):.3g} "
        f"(true {sigma_true:.3g}); acceptance = {float(acc):.2f}"
    )
    tau = autocorrelation_time(np.asarray(chain)[:, 0, 0])
    print(f"autocorrelation time (z chain, walker 0): {tau:.1f} steps")

    fig = plot_corner(
        np.asarray(chain).reshape(-1, 3),
        labels=["z_civ", "log N_CIV", "sigma"],
        burn_in=500 * np.asarray(chain).shape[1],
    )
    fig.savefig(os.path.join(outdir, "civ_corner.png"), dpi=100)
    print(f"wrote {outdir}/civ_corner.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
