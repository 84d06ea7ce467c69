"""End-to-end demo on synthetic data (no downloads, no .mat files).

Covers the full API surface the reference demonstrates across its
notebooks: train a GP on synthetic spectra, detect injected DLAs with
Bayesian model selection, refine parameters with MCMC, and produce the
survey statistics + plots.

    python examples/demo_synthetic.py [--out-dir demo_out]
"""

import argparse
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default="demo_out")
    parser.add_argument("--num-spectra", type=int, default=8)
    parser.add_argument("--num-samples", type=int, default=2000)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    from gpy_dla_detection_tpu import plotting
    from gpy_dla_detection_tpu.data.samples import (
        generate_dla_samples,
        generate_subdla_samples,
    )
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
        synthetic_prior_catalog,
    )
    from gpy_dla_detection_tpu.models import training as T
    from gpy_dla_detection_tpu.models.absorber_mcmc import run_dla_mcmc
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.parallel.batch import process_batch
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters(num_dla_samples=args.num_samples)
    truth = synthetic_learned_model(params)
    prior = synthetic_prior_catalog(params)

    # ----- 1. train a GP on clean synthetic spectra --------------------
    print("== training the null GP ==")
    wl_l, fx_l, nv_l, pm_l, zs = [], [], [], [], []
    rng = np.random.default_rng(0)
    for i in range(16):
        z = float(rng.uniform(2.5, 3.6))
        wl, fx, nv, pm = synthetic_observation(params, truth, z, seed=500 + i, noise_level=0.05)
        rest = wl / (1 + z)
        norm = np.nanmedian(fx[(rest >= 1310) & (rest <= 1325)])
        wl_l.append(wl); fx_l.append(fx / norm); nv_l.append(nv / norm**2)
        pm_l.append(pm); zs.append(z)
    train = T.prepare_training_set(params, wl_l, fx_l, nv_l, pm_l, zs)
    t0 = time.time()
    learned, losses = T.train_model(params, train, num_iterations=50)
    print(f"   trained in {time.time() - t0:.1f}s; loss {losses[0]:.1f} -> {losses[-1]:.1f}")

    # ----- 2. detect injected DLAs ------------------------------------
    print("== Bayesian model selection ==")
    injected = []
    spectra = []
    for i in range(args.num_spectra):
        z_qso = 2.8 + 0.1 * i
        dla = [(z_qso - 0.35, 20.6 + 0.1 * i)] if i % 2 else None
        injected.append(dla)
        wl, fx, nv, pm = synthetic_observation(params, truth, z_qso, seed=i, dlas=dla)
        spectra.append(preprocess(wl, fx, nv, pm, z_qso, params))

    dla_s = generate_dla_samples(params)
    sub_s = generate_subdla_samples(params)
    t0 = time.time()
    results = process_batch(
        learned, spectra, dla_s, sub_s, prior, params, jax.random.PRNGKey(0), 4
    )
    dt = time.time() - t0
    print(f"   {len(spectra)} spectra in {dt:.1f}s ({len(spectra) / dt:.2f}/s)")
    for i, r in enumerate(results):
        truth_str = f"injected z={injected[i][0][0]:.2f}" if injected[i] else "clean"
        print(
            f"   [{i}] {truth_str:>22}: p_dla={r.p_dla:.3f} "
            f"MAP z={r.map_z_dlas[0, 0]:.3f} logNHI={r.map_log_nhis[0, 0]:.2f}"
        )

    # ----- 3. MCMC refinement on one detection ------------------------
    print("== MCMC refinement ==")
    i_det = 1
    model = build_spectrum_model(learned.astype(np.float64), spectra[i_det], params)
    chain, lps, acc = run_dla_mcmc(
        model, params, jax.random.PRNGKey(7), k_dlas=1, nwalkers=32, nsamples=800
    )
    tail = np.asarray(chain[-300:]).reshape(-1, 2)
    print(
        f"   posterior z = {np.median(tail[:, 0]):.4f} +- {tail[:, 0].std():.4f}, "
        f"logNHI = {np.median(tail[:, 1]):.3f} +- {tail[:, 1].std():.3f} "
        f"(accept {float(acc):.2f})"
    )

    # ----- 4. plots ----------------------------------------------------
    fig = plotting.plot_dla_model(
        model,
        params,
        sample_z_dlas=np.asarray(spectra[i_det].min_z_dla)
        + (np.asarray(spectra[i_det].max_z_dla) - np.asarray(spectra[i_det].min_z_dla))
        * dla_s.offset_samples,
        log_nhi_samples=dla_s.log_nhi_samples,
        sample_log_likelihoods=results[i_det].sample_log_likelihoods_dla,
        map_z_dlas=results[i_det].map_z_dlas,
        map_log_nhis=results[i_det].map_log_nhis,
        nth_dla=1,
        title=f"p_dla = {results[i_det].p_dla:.3f}",
    )
    fig.savefig(os.path.join(args.out_dir, "dla_model.png"), dpi=90)
    fig2 = plotting.plot_corner(chain, labels=["z_dla", "logNHI"], burn_in=200)
    fig2.savefig(os.path.join(args.out_dir, "corner.png"), dpi=90)
    print(f"   wrote plots to {args.out_dir}/")


if __name__ == "__main__":
    main()
