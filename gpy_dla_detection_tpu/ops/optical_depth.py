"""Effective (mean-flux) optical depth of the Lyman-series forest.

Vectorized rewrite of the reference implementation (reference:
gpy_dla_detection/effective_optical_depth.py:10-80): one fused
(P, num_forest_lines) computation, no Python loop over lines.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C


def effective_optical_depth(wavelengths, beta, tau_0, z_qso, num_forest_lines: int):
    """Per-line effective optical depth of the Lyman forest.

    ``tau_i(lambda) = tau_0 * (f_i lambda_i)/(f_lya lambda_lya) * (1 + z_i)^beta``
    with ``1 + z_i = lambda / lambda_i`` and an indicator ``z_i <= z_qso``.

    :param wavelengths: (..., P) observed wavelengths [A].
    :param beta, tau_0: scalars (may be traced).
    :param z_qso: scalar quasar redshift.
    :return: (..., P, num_forest_lines) optical depths;
        ``exp(-sum(..., axis=-1))`` is the mean-flux suppression.
    """
    dtype = jnp.asarray(wavelengths).dtype
    lam = jnp.asarray(C.LYMAN_WAVELENGTHS_A[:num_forest_lines], dtype)  # (L,)
    osc = jnp.asarray(C.LYMAN_OSCILLATOR_STRENGTHS[:num_forest_lines], dtype)

    lya_lam = jnp.asarray(C.LYMAN_WAVELENGTHS_A[0], dtype)
    lya_osc = jnp.asarray(C.LYMAN_OSCILLATOR_STRENGTHS[0], dtype)

    one_plus_z = wavelengths[..., None] / lam  # (..., P, L)
    scale = tau_0 * osc / lya_osc * lam / lya_lam  # (L,)
    tau = scale * one_plus_z**beta
    indicator = one_plus_z - 1.0 <= z_qso
    return tau * indicator


def mean_flux_suppression(wavelengths, beta, tau_0, z_qso, num_forest_lines: int):
    """``a(lambda) = exp(-sum_i tau_i(lambda))``, the total Lyman-series
    suppression applied to the GP mean (reference: null_gp.py:204-214)."""
    tau = effective_optical_depth(wavelengths, beta, tau_0, z_qso, num_forest_lines)
    return jnp.exp(-jnp.sum(tau, axis=-1))
