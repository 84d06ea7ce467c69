"""Learned GP model container and per-spectrum model construction.

``LearnedModel`` holds the trained null-GP arrays (mean, low-rank
covariance factor, absorption-noise amplitudes and the Lyman-forest
noise parameters).  ``build_spectrum_model`` interpolates it onto one
observed spectrum and applies the mean-flux suppression — the pure,
jittable equivalent of the reference's ``set_data``/``get_interp``
instance methods (reference: gpy_dla_detection/null_gp.py:179-242).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..data.spectrum import Spectrum
from ..ops.interp import interp_uniform
from ..ops.optical_depth import effective_optical_depth
from ..params import Parameters


class LearnedModel(NamedTuple):
    """Trained null-model GP (reference: null_gp.py:35-64)."""

    rest_wavelengths: np.ndarray  # (R,) uniform rest grid [A]
    mu: np.ndarray  # (R,)
    M: np.ndarray  # (R, k)
    log_omega: np.ndarray  # (R,)
    log_c_0: np.ndarray  # scalar
    log_tau_0: np.ndarray  # scalar
    log_beta: np.ndarray  # scalar
    # mean-flux suppression parameters (Kim et al. 2007)
    prev_tau_0: np.ndarray  # scalar
    prev_beta: np.ndarray  # scalar

    def astype(self, dtype):
        return LearnedModel(*[jnp.asarray(f, dtype) for f in self])


class SpectrumModel(NamedTuple):
    """A learned model interpolated onto one spectrum's pixel grid,
    with mean-flux suppression applied; everything the likelihoods need.

    Shapes for one spectrum (batches add a leading axis);
    ``N`` window pixels, rank ``k``.
    """

    padded_wavelengths: jnp.ndarray  # (N + 6,)
    y: jnp.ndarray  # (N,) normalized flux
    v: jnp.ndarray  # (N,) instrumental noise variance
    mask: jnp.ndarray  # (N,) bool
    mu: jnp.ndarray  # (N,) suppressed GP mean
    M: jnp.ndarray  # (N, k) suppressed covariance factor
    omega2: jnp.ndarray  # (N,) scaled absorption-noise variance
    z_qso: jnp.ndarray
    min_z_dla: jnp.ndarray
    max_z_dla: jnp.ndarray


def build_spectrum_model(
    learned: LearnedModel, spec: Spectrum, params: Parameters
) -> SpectrumModel:
    """Interpolate the learned GP onto a spectrum and apply the
    Lyman-series mean-flux suppression and noise scaling.

    Implements (reference: null_gp.py:179-242):
        a(lambda)   = exp(-sum_i tau_kim,i(lambda))
        mu      <- mu * a;  M <- M * a
        omega2  <- exp(2 log_omega) * (1 - exp(-sum tau_learned) + c0)^2 * a^2
    """
    wavelengths = spec.padded_wavelengths[..., 3:-3]
    rest = wavelengths / (1.0 + spec.z_qso[..., None])

    x0 = learned.rest_wavelengths[0]
    dx = learned.rest_wavelengths[1] - learned.rest_wavelengths[0]
    mu = interp_uniform(x0, dx, learned.mu, rest)
    M = interp_uniform(x0, dx, learned.M, rest)
    log_omega = interp_uniform(x0, dx, learned.log_omega, rest)
    omega2 = jnp.exp(2.0 * log_omega)

    # learned Lyman-forest absorption-noise scaling
    tau_learned = effective_optical_depth(
        wavelengths,
        jnp.exp(learned.log_beta),
        jnp.exp(learned.log_tau_0),
        spec.z_qso[..., None, None],
        params.num_forest_lines,
    )
    scaling = 1.0 - jnp.exp(-jnp.sum(tau_learned, axis=-1)) + jnp.exp(learned.log_c_0)

    if params.suppress_mean_flux:
        # mean-flux suppression (Kim et al. 2007 parameters)
        tau_kim = effective_optical_depth(
            wavelengths,
            learned.prev_beta,
            learned.prev_tau_0,
            spec.z_qso[..., None, None],
            params.num_forest_lines,
        )
        a_lya = jnp.exp(-jnp.sum(tau_kim, axis=-1))
        mu = mu * a_lya
        M = M * a_lya[..., None]
        omega2 = omega2 * scaling**2 * a_lya**2
    else:
        # 2017 single-DLA mode: only the noise is scaled
        # (reference: process_qsos.m:145-147)
        omega2 = omega2 * scaling**2

    return SpectrumModel(
        padded_wavelengths=spec.padded_wavelengths,
        y=spec.flux,
        v=spec.noise_variance,
        mask=spec.mask,
        mu=mu,
        M=M,
        omega2=omega2,
        z_qso=spec.z_qso,
        min_z_dla=spec.min_z_dla,
        max_z_dla=spec.max_z_dla,
    )
