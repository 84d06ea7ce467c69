"""Batched Voigt absorption profiles.

TPU-first rewrite of the reference Voigt kernels (reference:
gpy_dla_detection/voigt.py:251-322, voigt_lls.py:287-363,
voigt_civ.py:103-175, voigt.c:253-304).  Design differences:

* batched over absorbers: ``nhi``/``z_absorber`` carry a leading sample
  axis and the profile is computed for all samples in one fused
  elementwise pipeline (the reference evaluates one absorber at a time
  inside a Python/parfor loop);
* the Faddeeva function is evaluated natively (ops/faddeeva.py) instead
  of calling scipy/libcerf;
* the relative velocity is computed as ``c * (lambda - lambda_c) /
  lambda_c`` instead of the reference's ``lambda * c / lambda_c - c``,
  avoiding catastrophic cancellation in float32;
* the 7-tap instrumental convolution is an unrolled shifted-sum (XLA
  fuses it with the exp) instead of ``np.convolve``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from .faddeeva import wofz_parts

SQRT_2PI = 2.5066282746310002


def instrumental_broadening(raw):
    """Valid-mode convolution with the 7-tap SDSS instrument profile.

    ``raw``: (..., P) -> (..., P - 6).
    (reference: gpy_dla_detection/voigt.py:311-320)
    """
    taps = jnp.asarray(C.INSTRUMENT_PROFILE, raw.dtype)
    width = C.INSTRUMENT_PROFILE_HALF_WIDTH
    P = raw.shape[-1]
    out = taps[0] * raw[..., : P - 2 * width]
    for k in range(1, 2 * width + 1):
        out = out + taps[k] * raw[..., k : P - 2 * width + k]
    return out


def _lyman_series_optical_depth(wavelengths, nhi, z_absorber, num_lines, sigma):
    """Summed Lyman-series optical depth tau(lambda) for each absorber.

    wavelengths: (P,) observed wavelengths [A]
    nhi, z_absorber: (...,) column density [cm^-2] and absorber redshift
    returns: (..., P)
    """
    dtype = wavelengths.dtype
    one_plus_z = (1.0 + z_absorber)[..., None]  # (..., 1)
    tau = None
    for l in range(num_lines):
        lam_l = jnp.asarray(C.LYMAN_WAVELENGTHS_A[l], dtype)
        lead_l = jnp.asarray(C.LYMAN_LEADING_CONSTANTS[l], dtype)
        gam_l = jnp.asarray(C.LYMAN_LORENTZIAN_WIDTHS[l], dtype)
        lam_c = lam_l * one_plus_z  # line center, observed frame (..., 1)
        # velocity in cm/s, cancellation-free form
        velocity = (wavelengths - lam_c) * (C.SPEED_OF_LIGHT_CGS / lam_c)
        inv = 1.0 / (jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma)
        w_re, _ = wofz_parts(velocity * inv, gam_l * inv)
        contrib = (lead_l * inv / jnp.asarray(jnp.sqrt(jnp.pi), dtype)) * w_re
        tau = contrib if tau is None else tau + contrib
    return nhi[..., None] * tau


def voigt_absorption(
    wavelengths,
    nhi,
    z_absorber,
    num_lines: int = 3,
    broadening: bool = True,
    sigma: float = C.THERMAL_SIGMA_CGS,
):
    """Absorption profile exp(-tau) of one absorber per sample.

    :param wavelengths: (P,) observed (padded) wavelengths [A].
    :param nhi: (...,) HI column densities [cm^-2].
    :param z_absorber: (...,) absorber redshifts.
    :return: (..., P - 6) if ``broadening`` else (..., P).
    (reference: gpy_dla_detection/voigt.py:251-322)
    """
    nhi = jnp.asarray(nhi)
    z_absorber = jnp.asarray(z_absorber)
    tau = _lyman_series_optical_depth(wavelengths, nhi, z_absorber, num_lines, sigma)
    raw = jnp.exp(-tau)
    if broadening:
        return instrumental_broadening(raw)
    return raw


def voigt_absorption_lls(
    wavelengths,
    nhi,
    z_absorber,
    num_lines: int = 3,
    broadening: bool = True,
    sigma: float = C.THERMAL_SIGMA_CGS,
):
    """Absorption profile including the Lyman-limit break opacity.

    Adds ``tau_break = nhi / 10^17.2 * (lambda_rest / 911.7641)^3`` for
    rest wavelengths below the Lyman limit.
    (reference: gpy_dla_detection/voigt_lls.py:254-363)
    """
    lambda_lyman_limit = 911.7641
    nhi = jnp.asarray(nhi)
    z_absorber = jnp.asarray(z_absorber)
    tau = _lyman_series_optical_depth(wavelengths, nhi, z_absorber, num_lines, sigma)
    rest = wavelengths / (1.0 + z_absorber)[..., None]
    tau_break = jnp.where(
        rest > lambda_lyman_limit,
        0.0,
        nhi[..., None] / 10**17.2 * (rest / lambda_lyman_limit) ** 3,
    )
    raw = jnp.exp(-(tau + tau_break))
    if broadening:
        return instrumental_broadening(raw)
    return raw


def voigt_absorption_civ(
    wavelengths,
    nciv,
    z_civ,
    sigma,
    num_lines: int = 2,
    broadening: bool = True,
):
    """CIV doublet absorption; the broadening velocity ``sigma`` is a free
    parameter per sample (reference: gpy_dla_detection/voigt_civ.py:103-175).

    :param nciv, z_civ, sigma: (...,) per-sample parameters.
    """
    dtype = jnp.asarray(wavelengths).dtype
    nciv = jnp.asarray(nciv)
    z_civ = jnp.asarray(z_civ)
    sigma = jnp.asarray(sigma)[..., None]
    one_plus_z = (1.0 + z_civ)[..., None]
    tau = None
    for l in range(num_lines):
        lam_l = jnp.asarray(C.CIV_WAVELENGTHS_CM[l] * 1e8, dtype)
        lead_l = jnp.asarray(C.CIV_LEADING_CONSTANTS[l], dtype)
        gam_l = jnp.asarray(C.CIV_LORENTZIAN_WIDTHS[l], dtype)
        lam_c = lam_l * one_plus_z
        velocity = (wavelengths - lam_c) * (C.SPEED_OF_LIGHT_CGS / lam_c)
        inv = 1.0 / (jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma)
        w_re, _ = wofz_parts(velocity * inv, gam_l * inv)
        contrib = (lead_l / jnp.asarray(jnp.sqrt(jnp.pi), dtype)) * inv * w_re
        tau = contrib if tau is None else tau + contrib
    raw = jnp.exp(-nciv[..., None] * tau)
    if broadening:
        return instrumental_broadening(raw)
    return raw
