"""Smoke tests: every plot function renders without error (Agg)."""

import numpy as np
import jax
import matplotlib
import pytest

matplotlib.use("Agg")


@pytest.fixture(autouse=True)
def _close_figures():
    """Close every figure a test opened (the smoke tests render 20+
    figures; matplotlib warns and holds their memory otherwise)."""
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


def test_all_plots_render(tmp_path):
    from gpy_dla_detection_tpu import plotting
    from gpy_dla_detection_tpu.data.samples import generate_dla_samples
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.models.evidence import qmc_log_evidences
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.params import Parameters
    import jax.numpy as jnp

    params = Parameters(num_dla_samples=80)
    learned = synthetic_learned_model(params)
    wl, fx, nv, pm = synthetic_observation(params, learned, 3.0, seed=2, dlas=[(2.7, 21.0)])
    spec = preprocess(wl, fx, nv, pm, 3.0, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)
    s = generate_dla_samples(params)
    result = qmc_log_evidences(
        model,
        jnp.asarray(s.offset_samples),
        jnp.asarray(s.log_nhi_samples),
        jnp.asarray(s.nhi_samples),
        jax.random.PRNGKey(0),
        2,
        params,
    )

    ax = plotting.plot_raw_spectrum(wl, fx, 3.0)
    assert ax is not None

    z_s = float(spec.min_z_dla) + (
        float(spec.max_z_dla) - float(spec.min_z_dla)
    ) * s.offset_samples
    fig = plotting.plot_dla_model(
        model,
        params,
        sample_z_dlas=z_s,
        log_nhi_samples=s.log_nhi_samples,
        sample_log_likelihoods=np.asarray(result.sample_log_likelihoods),
        map_z_dlas=np.asarray(result.map_z_dlas),
        map_log_nhis=np.asarray(result.map_log_nhis),
        nth_dla=1,
        title="test",
    )
    fig.savefig(str(tmp_path / "dla.png"), dpi=40)

    chain = np.random.default_rng(0).normal(size=(50, 8, 2)) + [2.7, 21.0]
    fig = plotting.plot_corner(chain, labels=["z", "logNHI"], burn_in=10)
    fig.savefig(str(tmp_path / "corner.png"), dpi=40)

    fig = plotting.plot_sample_predictions(chain, model, params, n_draws=5)
    fig.savefig(str(tmp_path / "draws.png"), dpi=40)

    # CDDF-style plots from toy arrays
    l_cent = np.linspace(20.4, 22.6, 5)
    cddf = 10.0 ** (-21 - (l_cent - 20.4))
    band = np.stack([cddf * 0.5, cddf * 2], axis=1)
    ax = plotting.plot_cddf(l_cent, cddf, band, band, (cddf * 0, cddf * 0))
    z_cent = np.array([2.2, 2.6, 3.0])
    dndx = np.array([0.05, 0.06, 0.07])
    band = np.stack([dndx * 0.7, dndx * 1.3], axis=1)
    ax = plotting.plot_line_density(z_cent, dndx, band, band, (z_cent * 0, z_cent * 0))
    ax = plotting.plot_omega_dla(z_cent, dndx * 1e-2, dndx * 1e-3)

    # comparison figures (round 2)
    from gpy_dla_detection_tpu.analysis.catalog_tools import roc_curve

    p = np.array([0.9, 0.2, 0.8, 0.1, 0.7])
    truth = np.array([1, 0, 1, 0, 0], bool)
    fpr, tpr, _, auc = roc_curve(p, truth)
    ax = plotting.plot_roc(fpr, tpr, auc)
    ax = plotting.plot_confusion(np.array([[5, 1], [2, 7]]))
    ax = plotting.plot_confusion(np.array([[5, 1], [2, 7]]), normalize=True)

    ax = plotting.plot_annotated_spectrum(
        model,
        params,
        map_z_dlas=np.asarray(result.map_z_dlas)[0, :1],
        map_log_nhis=np.asarray(result.map_log_nhis)[0, :1],
        truth_dlas={
            "concordance": [(2.7, 21.0)],
            "parks": [(2.69, 20.9), (2.9, 20.4)],
        },
    )
    ax.figure.savefig(str(tmp_path / "annotated.png"), dpi=40)

    ax = plotting.plot_cddf_external(l_cent, cddf, (cddf * 0, cddf * 0))
    ax = plotting.plot_cddf_external(l_cent, cddf, (cddf * 0, cddf * 0), moment=True)
    ax = plotting.plot_line_density_external(z_cent, dndx, (z_cent * 0, z_cent * 0))

    # learned-model correlation heatmap (GPLoader parity)
    C = plotting.build_correlation_matrix(np.asarray(learned.M))
    np.testing.assert_allclose(np.diag(C), 1.0, rtol=1e-10)
    assert np.abs(C).max() <= 1.0 + 1e-8
    ax = plotting.plot_model_correlation(learned.rest_wavelengths, learned.M)
    ax.figure.savefig(str(tmp_path / "corr.png"), dpi=40)


def test_split_and_bootstrap_plots_render(tmp_path):
    from gpy_dla_detection_tpu import plotting

    from .test_cddf import _toy_catalog

    cat, *_ = _toy_catalog(num_spec=30, S=150, seed=7)
    cat.snrs = np.full(30, 5.0)
    ax = plotting.plot_cddf_by_z(cat, z_edges=(2.0, 2.8, 3.5), lnhi_nbins=6)
    ax.figure.savefig(str(tmp_path / "cddf_z.png"), dpi=40)
    ax = plotting.plot_cddf_by_snr(
        cat, snr_threshs=(-2.0, 2.0), z_min=2.0, z_max=3.5, lnhi_nbins=6
    )
    ax = plotting.plot_dndx_sample_errors(cat, z_min=2.0, z_max=3.5, nsample=3)
    ax.figure.savefig(str(tmp_path / "dndx_errs.png"), dpi=40)
    ax = plotting.plot_omega_sample_errors(cat, z_min=2.0, z_max=3.5, nsample=3)


def test_paper_plot_drivers_render(tmp_path):
    """Every make_plots.py-style driver renders its full figure set and
    writes the data tables, and catalog state is restored afterwards
    (reference: CDDF_analysis/make_plots.py:12-269)."""
    from gpy_dla_detection_tpu.analysis import paper_plots as pp
    from .test_cddf import _toy_catalog

    cat, *_ = _toy_catalog(num_spec=30, S=200)
    cat.bins_per_z = 2  # keep the z binning coarse for 30 spectra
    sub = str(tmp_path / "paper")

    before = (cat.snr_thresh, cat.lowzcut, cat.max_k,
              cat.p_thresh_sample, cat.p_thresh_spec, cat.condition)
    pp.make_all_plots(cat, sub)
    after = (cat.snr_thresh, cat.lowzcut, cat.max_k,
             cat.p_thresh_sample, cat.p_thresh_spec, cat.condition)
    assert before == after

    import os
    made = set(os.listdir(sub))
    for stem in [
        "cddf_gp", "cddf_moment_gp", "cddf_zz_gp", "dndx_gp", "omega_gp",
        "dndx_gp_resample", "omega_gp_resample", "dndx_p_thresh",
        "omega_gp_snr", "dndx_gp_snr", "omega_gp_lowz", "dndx_gp_lowz",
        "omega_gp_zqsoFalse", "dndx_gp_zqsoFalse", "omega_gp_zqsoTrue",
        "omega_gp_zdiff", "dndx_gp_zdiff", "omega_gp_diff", "dndx_2dla",
        "omega_2dla",
    ]:
        assert f"{stem}.pdf" in made, stem
    for txt in ["cddf_all.txt", "cddf_z34.txt", "dndx_all.txt",
                "omega_dla_all.txt"]:
        assert txt in made, txt
        data = np.loadtxt(os.path.join(sub, txt))
        assert data.shape[0] == 6  # value + 68/95 bands

    # compare-plots overlay two catalogs
    cat2, *_ = _toy_catalog(num_spec=30, S=200, seed=1)
    cat2.bins_per_z = 2
    pp.do_compare_plots(cat, cat2, sub, label="alt")
    assert "omega_alt.pdf" in set(os.listdir(sub))
