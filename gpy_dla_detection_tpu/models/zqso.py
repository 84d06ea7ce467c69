"""Quasar redshift estimation with a GP prior over the emission spectrum.

TPU-native rewrite of the reference's ``ZGP`` (reference:
gpy_dla_detection/zqso_gp.py:14-319).  The reference re-runs its
stateful ``set_data`` (re-window, re-normalize, re-interpolate) once
per candidate redshift in a 10,000-iteration Python loop
(zqso_gp.py:231-243); here the whole scan is one fixed-shape,
mask-recomputed evaluation vmapped over the redshift grid and processed
in chunks to bound memory.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interp_uniform
from ..ops.logmvn import LOG_2PI, log_mvnpdf_low_rank
from ..params import ZParameters


class ZLearnedModel(NamedTuple):
    """Trained zQSO GP (reference: zqso_gp.py:36-64, ZGPMAT:288-319)."""

    rest_wavelengths: np.ndarray  # (R,)
    mu: np.ndarray  # (R,)
    M: np.ndarray  # (R, k)
    bluewards_mu: np.ndarray  # scalar
    bluewards_sigma: np.ndarray  # scalar
    redwards_mu: np.ndarray  # scalar
    redwards_sigma: np.ndarray  # scalar

    def astype(self, dtype):
        return ZLearnedModel(*[jnp.asarray(f, dtype) for f in self])


class ZSpectrum(NamedTuple):
    """A full observed spectrum, fixed-shape (no windowing yet —
    windows depend on the candidate redshift)."""

    wavelengths: jnp.ndarray  # (P,)
    flux: jnp.ndarray  # (P,)
    noise_variance: jnp.ndarray  # (P,)
    valid: jnp.ndarray  # (P,) bool: real, unmasked pixel


def prepare_z_spectrum(
    wavelengths, flux, noise_variance, pixel_mask, num_pixels: int | None = None
) -> ZSpectrum:
    """Pad one observed spectrum to a fixed pixel count (host-side).

    ``num_pixels`` defaults to ``ZParameters.num_pixels_padded`` — the
    single source of truth for the zQSO padding size.
    """
    if num_pixels is None:
        num_pixels = ZParameters().num_pixels_padded
    wavelengths = np.asarray(wavelengths, np.float64)
    flux = np.asarray(flux, np.float64)
    noise_variance = np.asarray(noise_variance, np.float64)
    pixel_mask = np.asarray(pixel_mask, bool)

    n = wavelengths.shape[0]
    if n > num_pixels:
        raise ValueError(f"spectrum has {n} > {num_pixels} pixels")
    # infinite/NaN variances are unusable pixels (reference kludges them
    # to the mean, zqso_gp.py:177; masking is cleaner)
    bad = pixel_mask | ~np.isfinite(noise_variance) | ~np.isfinite(flux)

    wl = np.full(num_pixels, wavelengths[-1] if n else 1.0)
    fx = np.zeros(num_pixels)
    nv = np.ones(num_pixels)
    valid = np.zeros(num_pixels, bool)
    wl[:n] = wavelengths
    fx[:n] = np.where(bad, 0.0, np.nan_to_num(flux))
    nv[:n] = np.where(bad, 1.0, np.nan_to_num(noise_variance, nan=1.0))
    valid[:n] = ~bad
    return ZSpectrum(wl, fx, nv, valid)


def _masked_median(values, mask):
    """Median over masked entries (fixed shape)."""
    big = jnp.asarray(jnp.inf, values.dtype)
    x = jnp.sort(jnp.where(mask, values, big))
    n = jnp.sum(mask)
    hi = jnp.clip((n // 2), 0, x.shape[0] - 1)
    lo = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    return 0.5 * (x[lo] + x[hi])


def z_log_evidence(
    learned: ZLearnedModel, spec: ZSpectrum, z_qso, params: ZParameters
):
    """log p(D | z_qso) for one candidate redshift
    (reference: zqso_gp.py:92-212)."""
    wl = spec.wavelengths
    rest = wl / (1.0 + z_qso)

    # observable cut: the part of the spectrum the GP window can cover
    max_obs = jnp.minimum(params.max_lambda * (1.0 + z_qso), jnp.max(jnp.where(spec.valid, wl, -jnp.inf)))
    min_obs = jnp.maximum(params.min_lambda * (1.0 + z_qso), jnp.min(jnp.where(spec.valid, wl, jnp.inf)))
    in_cut = (wl > min_obs) & (wl < max_obs)

    # normalization over the rest-frame window (reference: zqso_gp.py:141-148)
    norm_ind = (
        (rest >= params.normalization_min_lambda)
        & (rest <= params.normalization_max_lambda)
        & in_cut
        & spec.valid
    )
    median = _masked_median(spec.flux, norm_ind)
    y = spec.flux / median
    v = spec.noise_variance / (median * median)

    # in-model window
    model_ind = (
        (rest >= params.min_lambda) & (rest <= params.max_lambda) & in_cut & spec.valid
    )

    x0 = learned.rest_wavelengths[0]
    dx = learned.rest_wavelengths[1] - learned.rest_wavelengths[0]
    mu = interp_uniform(x0, dx, learned.mu, rest)
    M = interp_uniform(x0, dx, learned.M, rest)

    in_window_ll = log_mvnpdf_low_rank(y, mu, M, v, model_ind)

    # out-of-window pixels: iid Gaussians (reference: zqso_gp.py:196-212)
    bw_ind = (wl < min_obs) & spec.valid
    rw_ind = (wl > max_obs) & spec.valid

    def iid_ll(ind, m, s):
        d = s * s + v
        delta = jnp.where(ind, y - m, 0.0)
        d_inv = jnp.where(ind, 1.0 / d, 0.0)
        log_d = jnp.where(ind, jnp.log(d), 0.0)
        n = jnp.sum(ind)
        return -0.5 * (
            jnp.sum(delta * delta * d_inv) + jnp.sum(log_d) + n * LOG_2PI
        )

    bw_ll = iid_ll(bw_ind, learned.bluewards_mu, learned.bluewards_sigma)
    rw_ll = iid_ll(rw_ind, learned.redwards_mu, learned.redwards_sigma)
    return in_window_ll + bw_ll + rw_ll


def sample_z_qsos(num_samples: int, z_qso_min: float = 2.14, z_qso_max: float = 6.16):
    """The linear redshift grid scanned by the estimator
    (reference: zqso_samples.py:26-29)."""
    return np.linspace(z_qso_min, z_qso_max, num_samples)


@partial(jax.jit, static_argnames=("params", "chunk_size"))
def z_log_evidences(
    learned: ZLearnedModel,
    spec: ZSpectrum,
    z_grid: jnp.ndarray,
    params: ZParameters,
    chunk_size: int = 250,
):
    """log p(D | z) over the whole grid, chunked vmap to bound memory."""
    Z = z_grid.shape[0]
    n_chunks = -(-Z // chunk_size)
    pad = n_chunks * chunk_size - Z
    z_padded = jnp.concatenate([z_grid, jnp.full((pad,), z_grid[-1], z_grid.dtype)])
    chunks = z_padded.reshape(n_chunks, chunk_size)

    def one_chunk(zs):
        return jax.vmap(lambda z: z_log_evidence(learned, spec, z, params))(zs)

    lls = jax.lax.map(one_chunk, chunks).reshape(-1)
    return lls[:Z]


def inference_z_qso(
    learned: ZLearnedModel,
    spec: ZSpectrum,
    params: ZParameters,
    z_qso_min: float = 2.14,
    z_qso_max: float = 6.16,
):
    """MAP redshift over the sample grid (reference: zqso_gp.py:214-250).

    :return: (z_map, sample_log_likelihoods, z_grid)
    """
    z_grid = jnp.asarray(sample_z_qsos(params.num_zqso_samples, z_qso_min, z_qso_max))
    lls = z_log_evidences(learned, spec, z_grid, params)
    idx = jnp.nanargmax(lls)
    return float(z_grid[idx]), np.asarray(lls), np.asarray(z_grid)
