"""Diagnostic and science plots.

Rewrites of the reference's plotting helpers (reference:
gpy_dla_detection/plottings/plot_model.py:12-135,
plot_raw_spectrum.py:14-62, examples/plot_mcmc.py:42-78, and the CDDF
plot wrappers in CDDF_analysis/calc_cddf.py:684-901).  Matplotlib only;
all inputs are plain arrays / result pytrees — nothing here touches the
device.
"""

from __future__ import annotations

import numpy as np

from .constants import LYA_WAVELENGTH_A
from .models.learned import SpectrumModel
from .ops.voigt import voigt_absorption
from .params import Parameters


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_raw_spectrum(wavelengths, flux, z_qso, ax=None):
    """Observed spectrum with a rest-frame secondary axis
    (reference: plottings/plot_raw_spectrum.py:14-62)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(12, 4))
    ax.plot(wavelengths, flux, lw=0.4, color="C0")
    ax.set_xlabel(r"observed wavelength [$\AA$]")
    ax.set_ylabel(r"flux [$10^{-17}$ erg s$^{-1}$ cm$^{-2}$ $\AA^{-1}$]")
    secax = ax.secondary_xaxis(
        "top",
        functions=(lambda x: x / (1 + z_qso), lambda x: x * (1 + z_qso)),
    )
    secax.set_xlabel(r"rest wavelength [$\AA$]")
    return ax


def plot_dla_model(
    model: SpectrumModel,
    params: Parameters,
    sample_z_dlas=None,
    log_nhi_samples=None,
    sample_log_likelihoods=None,
    map_z_dlas=None,
    map_log_nhis=None,
    nth_dla: int = 1,
    title: str = "",
    label: str = "",
):
    """Two-panel DLA inference plot: sample-likelihood scatter in
    (z_dla, logNHI) and the MAP-absorbed GP mean over the data
    (reference: plottings/plot_model.py:12-135)."""
    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(14, 8))

    mask = np.asarray(model.mask)
    wavelengths = np.asarray(model.padded_wavelengths)[3:-3]

    if sample_log_likelihoods is not None:
        lls = np.asarray(sample_log_likelihoods)[:, 0]
        finite = np.isfinite(lls)
        sc = ax1.scatter(
            np.asarray(sample_z_dlas)[finite],
            np.asarray(log_nhi_samples)[finite],
            c=lls[finite],
            s=4,
            cmap="viridis",
        )
        plt.colorbar(sc, ax=ax1, label=r"$\log p(D\,|\,z_{DLA}, N_{HI})$")
    ax1.set_xlabel(r"$z_{DLA}$")
    ax1.set_ylabel(r"$\log N_{HI}$")
    ax1.set_title(title)

    ax2.plot(
        wavelengths[mask] / (1 + float(model.z_qso)),
        np.asarray(model.y)[mask],
        lw=0.4,
        color="C0",
        label="observed",
    )
    mu = np.asarray(model.mu)
    if map_z_dlas is not None and nth_dla >= 1:
        z_dlas = np.asarray(map_z_dlas)[nth_dla - 1, :nth_dla]
        log_nhis = np.asarray(map_log_nhis)[nth_dla - 1, :nth_dla]
        absorption = np.prod(
            np.asarray(
                voigt_absorption(
                    model.padded_wavelengths,
                    10.0**log_nhis,
                    z_dlas,
                    params.num_lines,
                )
            ),
            axis=0,
        )
        mu = mu * absorption
    ax2.plot(
        wavelengths[mask] / (1 + float(model.z_qso)),
        mu[mask],
        lw=1.0,
        color="C3",
        label=label or "GP mean",
    )
    ax2.axvline(LYA_WAVELENGTH_A, ls=":", color="k", lw=0.5)
    ax2.set_xlabel(r"rest wavelength [$\AA$]")
    ax2.set_ylabel("normalized flux")
    ax2.legend()
    fig.tight_layout()
    return fig


def plot_corner(chain, labels=None, burn_in: int = 0, bins: int = 40):
    """Corner (pair) plot of an MCMC chain (num_steps, W, D)
    (reference: examples/plot_mcmc.py:42-59; corner-free)."""
    plt = _plt()
    samples = np.asarray(chain)[burn_in:].reshape(-1, np.asarray(chain).shape[-1])
    D = samples.shape[1]
    fig, axes = plt.subplots(D, D, figsize=(2.2 * D, 2.2 * D))
    axes = np.atleast_2d(axes)
    for i in range(D):
        for j in range(D):
            ax = axes[i, j]
            if j > i:
                ax.axis("off")
            elif i == j:
                ax.hist(samples[:, i], bins=bins, histtype="step", color="k")
            else:
                ax.hist2d(samples[:, j], samples[:, i], bins=bins, cmap="Greys")
            if i == D - 1 and labels:
                ax.set_xlabel(labels[j])
            if j == 0 and labels and i > 0:
                ax.set_ylabel(labels[i])
    fig.tight_layout()
    return fig


def plot_sample_predictions(
    chain,
    model: SpectrumModel,
    params: Parameters,
    n_draws: int = 200,
    burn_in: int = 0,
    seed: int = 0,
):
    """Posterior draws of the absorbed GP mean over the data
    (reference: examples/plot_mcmc.py:60-78)."""
    plt = _plt()
    rng = np.random.default_rng(seed)
    samples = np.asarray(chain)[burn_in:].reshape(-1, np.asarray(chain).shape[-1])
    k = samples.shape[1] // 2
    idx = rng.integers(0, samples.shape[0], size=n_draws)

    mask = np.asarray(model.mask)
    rest = (np.asarray(model.padded_wavelengths)[3:-3] / (1 + float(model.z_qso)))[mask]
    fig, ax = plt.subplots(figsize=(14, 5))
    ax.plot(rest, np.asarray(model.y)[mask], lw=0.4, color="C0", label="observed")
    for i in idx:
        z = samples[i, :k]
        log_nhi = samples[i, k:]
        absorption = np.prod(
            np.asarray(
                voigt_absorption(
                    model.padded_wavelengths, 10.0**log_nhi, z, params.num_lines
                )
            ),
            axis=0,
        )
        ax.plot(
            rest,
            (np.asarray(model.mu) * absorption)[mask],
            lw=0.1,
            color="C3",
            alpha=0.05,
        )
    ax.set_xlabel(r"rest wavelength [$\AA$]")
    ax.set_ylabel("normalized flux")
    fig.tight_layout()
    return fig


def plot_cddf(l_cent, cddf, cddf68, cddf95, xerrs, label="GP", ax=None):
    """CDDF with 68/95% intervals (reference: calc_cddf.py:684-707)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    ax.fill_between(10.0**l_cent, cddf95[:, 0], cddf95[:, 1], color="grey", alpha=0.5)
    yerr = (cddf - cddf68[:, 0], cddf68[:, 1] - cddf)
    ii = cddf68[:, 0] > 0
    ax.errorbar(
        10.0 ** l_cent[ii],
        cddf[ii],
        yerr=(yerr[0][ii], yerr[1][ii]),
        xerr=(xerrs[0][ii], xerrs[1][ii]),
        fmt="o",
        label=label,
    )
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(r"$N_\mathrm{HI}$ (cm$^{-2}$)")
    ax.set_ylabel(r"$f(N_\mathrm{HI})$")
    return ax


def plot_line_density(z_cent, dNdX, dndx68, dndx95, xerrs, label="GP", ax=None):
    """dN/dX(z) (reference: calc_cddf.py:727-738)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    ax.fill_between(z_cent, dndx95[:, 0], dndx95[:, 1], color="grey", alpha=0.5)
    ax.errorbar(
        z_cent,
        dNdX,
        yerr=(dNdX - dndx68[:, 0], dndx68[:, 1] - dNdX),
        xerr=xerrs,
        fmt="o",
        label=label,
    )
    ax.set_xlabel("z")
    ax.set_ylabel("dN/dX")
    return ax


def plot_omega_dla(z_cent, omega, omega_err, label="GP", ax=None):
    """Omega_DLA(z) (reference: calc_cddf.py:882-901)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    ax.errorbar(z_cent, 1000 * omega, yerr=1000 * omega_err, fmt="o", label=label)
    ax.set_xlabel("z")
    ax.set_ylabel(r"$10^3 \times \Omega_\mathrm{DLA}$")
    return ax
