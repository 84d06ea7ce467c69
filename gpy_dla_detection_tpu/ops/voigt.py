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

import jax
import jax.numpy as jnp

from .. import constants as C
from .faddeeva import RADIUS, SQRT_PI, _wofz_cf, _wofz_weideman, wofz_parts

SQRT_2PI = 2.5066282746310002

# half-width (pixels) of the exact-evaluation window around each line
# center in the windowed fast path; the |z| <= RADIUS core spans only
# ~±1.3 pixels at SDSS resolution (90 km/s vs 69 km/s pixels)
WINDOW_HALF_WIDTH = 16


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


def _lyman_series_optical_depth_windowed(
    wavelengths, nhi, z_absorber, num_lines, sigma
):
    """Fast path: continued-fraction Faddeeva everywhere plus an exact
    (Weideman) correction scattered onto a ±WINDOW_HALF_WIDTH-pixel
    window around each line center — the only pixels whose |z| can fall
    inside the rational approximation's disk.  Requires a 2-D batch:
    nhi, z (S,); wavelengths (P,).  Accuracy: ~1e-4 relative at the line
    cores (f32 cancellation of the CF garbage), identical to the exact
    path elsewhere.
    """
    dtype = wavelengths.dtype
    S = z_absorber.shape[0]
    P = wavelengths.shape[0]
    W = WINDOW_HALF_WIDTH
    inv = 1.0 / (jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma)
    c_over = jnp.asarray(C.SPEED_OF_LIGHT_CGS, dtype)

    one_plus_z = (1.0 + z_absorber)[:, None]  # (S, 1)
    tau = jnp.zeros((S, P), dtype)
    correction = jnp.zeros((S, num_lines, 2 * W), dtype)
    starts = jnp.zeros((S, num_lines), jnp.int32)

    for l in range(num_lines):
        lam_l = jnp.asarray(C.LYMAN_WAVELENGTHS_A[l], dtype)
        lead_l = jnp.asarray(C.LYMAN_LEADING_CONSTANTS[l], dtype)
        gam_l = jnp.asarray(C.LYMAN_LORENTZIAN_WIDTHS[l], dtype)
        amp = lead_l * inv / jnp.asarray(jnp.sqrt(jnp.pi), dtype)
        lam_c = lam_l * one_plus_z  # (S, 1)
        y_l = gam_l * inv

        # cheap CF evaluation over all pixels; inside the |z| <= RADIUS
        # disk the CF is invalid — contribute exactly zero there (the
        # window pass below adds the exact value, with no cancellation)
        x_all = (wavelengths - lam_c) * (c_over / lam_c) * inv  # (S, P)
        ax_all = jnp.abs(x_all)
        cf_re, _ = _wofz_cf(ax_all, jnp.full_like(x_all, y_l))
        outer_all = ax_all * ax_all + y_l * y_l > RADIUS * RADIUS
        tau = tau + amp * jnp.where(outer_all, cf_re, 0.0)

        # exact evaluation on the window around the line center (the
        # only pixels that can fall inside the disk)
        idx = jnp.searchsorted(wavelengths, lam_c[:, 0]).astype(jnp.int32)
        start = jnp.clip(idx - W, 0, P - 2 * W)  # (S,)
        win_idx = start[:, None] + jnp.arange(2 * W, dtype=jnp.int32)  # (S, 2W)
        wl_win = wavelengths[win_idx]  # (S, 2W)
        x_win = (wl_win - lam_c) * (c_over / lam_c) * inv
        ax = jnp.abs(x_win)
        y_win = jnp.full_like(x_win, y_l)
        inner = ax * ax + y_l * y_l <= RADIUS * RADIUS
        wei_win, _ = _wofz_weideman(jnp.where(inner, ax, 0.0), y_win)
        correction = correction.at[:, l, :].set(
            amp * jnp.where(inner, wei_win, 0.0)
        )
        starts = starts.at[:, l].set(start)

    # scatter-add all window corrections
    rows = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    cols = starts[:, :, None] + jnp.arange(2 * W, dtype=jnp.int32)
    tau = tau.at[rows, cols].add(correction)
    return nhi[:, None] * tau


def _use_fast_voigt(x) -> bool:
    import os

    from .logmvn import _on_tpu

    # off by default: the windowed evaluation saves ~3x Faddeeva flops
    # but its (S, L, 2W) scatter-add lowers to a catastrophically slow
    # op on TPU (measured 18 -> 6.7 spectra/s end to end).  Kept for a
    # future Pallas variant where the window update is a per-row
    # dynamic-slice store instead of an XLA scatter.
    return (
        os.environ.get("GPY_DLA_FAST_VOIGT", "0") == "1"
        and jnp.result_type(x) == jnp.float32
        and not jax.config.jax_enable_x64
        and _on_tpu(x)
    )


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
    if (
        z_absorber.ndim == 1
        and wavelengths.ndim == 1
        and _use_fast_voigt(wavelengths)
    ):
        tau = _lyman_series_optical_depth_windowed(
            wavelengths, nhi, z_absorber, num_lines, sigma
        )
    else:
        tau = _lyman_series_optical_depth(
            wavelengths, nhi, z_absorber, num_lines, sigma
        )
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
