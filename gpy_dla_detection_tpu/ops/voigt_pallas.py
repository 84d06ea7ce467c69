"""Pallas TPU kernels for the windowed Voigt absorption hot path.

The physics: at SDSS resolution (69 km/s pixels) only ~±2 pixels around
each line center fall inside the Weideman rational approximation's
|z| <= RADIUS disk; everywhere else cheaper evaluations (per-line
polynomial Faddeeva / continued fraction / far-field Lorentzian) are
exact to f32.  The kernels here fuse window evaluation, placement, exp,
the 7-tap instrumental convolution and the storage encode, so the raw
profile never exists outside VMEM:

* ``absorption_all_pallas`` — the production kernel: the ENTIRE
  windowed absorption for every column-density family in one pass.
* ``absorption_from_unit_tau_pallas`` / ``absorption_windowed_pallas``
  — exp + broadening (+ window placement) tails over a precomputed
  unit optical depth, used when the tau is shared across families.

The round-1 standalone per-row-dynamic-slice kernel
(GPY_DLA_PALLAS_VOIGT) was measured SLOWER than the XLA windowed
composition on v5e (its per-row ``pl.ds`` gather/scatter loops
serialize; PERFORMANCE.md keeps the numbers) and was deleted in
round 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .kernel_config import ABS_I16_SCALE, largest_aligned_divisor
from .faddeeva import (
    RADIUS,
    _wofz_cf,
    _wofz_weideman,
)

# full window width around each line center: Mosaic only supports
# lane-dimension dynamic slices at 128-aligned offsets, so the window is
# two aligned 128-lane tiles; alignment + the 3000 km/s max_z cut
# guarantee every line core (|z| <= RADIUS spans ~±2 px) is covered
WINDOW = 256


def _out_width(n: int, out_dtype) -> int:
    """Stored lane count of an n-pixel profile row: n/2 for packed
    int32 i16-pair storage (n must be even), n otherwise."""
    if out_dtype is not None and jnp.dtype(out_dtype) == jnp.int32:
        if n % 2:
            raise ValueError(
                f"packed i16-pair storage needs an even pixel count, got {n}"
            )
        return n // 2
    return n


def _encode_store(acc, dtype):
    """Encode a profile block for its storage dtype: f32 verbatim,
    int16 as fixed-point codes round(a * ABS_I16_SCALE), int32 as
    PACKED i16-pair codes (contiguous halves in one lane — see
    ops/kernel_config.py)."""
    if dtype == jnp.int16:
        return jnp.round(acc * ABS_I16_SCALE).astype(dtype)
    if dtype == jnp.int32:
        v = jnp.round(acc * ABS_I16_SCALE).astype(jnp.int32)
        h = v.shape[-1] // 2
        return v[:, :h] | (v[:, h:] << 16)
    return acc.astype(dtype)


def _abs_tail_kernel(tau_ref, nhi_ref, out_ref, *, taps, width):
    """exp(-nhi * tau) followed by the valid-mode 7-tap instrumental
    convolution, entirely in VMEM."""
    raw = jnp.exp(-nhi_ref[:] * tau_ref[:])  # (BS, P)
    P = raw.shape[-1]
    n = P - 2 * width
    acc = taps[0] * raw[:, 0:n]
    for t in range(1, 2 * width + 1):
        acc = acc + taps[t] * raw[:, t : t + n]
    out_ref[:] = _encode_store(acc, out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def absorption_from_unit_tau_pallas(
    unit_tau, nhi, interpret: bool = False, out_dtype=None
):
    """Fused broadened absorption from a unit optical depth:
    ``conv(exp(-nhi[:, None] * unit_tau))`` as one kernel.

    The XLA composition materializes the raw profile and then pays a
    lane relayout for each of the seven shifted reads of the unrolled
    convolution — profiled at 174 ms of 1,378 ms total (12.6%) on the
    bench workload; here the raw profile never leaves VMEM.

    :param unit_tau: (S, P) per-unit-column-density optical depth on
        the PADDED pixel grid.
    :param nhi: (S,) column densities.
    :return: (S, P - 6) broadened absorption.
    """
    width = C.INSTRUMENT_PROFILE_HALF_WIDTH
    taps = tuple(float(t) for t in C.INSTRUMENT_PROFILE)
    S, P = unit_tau.shape

    # block size: largest 8-aligned divisor of S under the budget
    block_s = largest_aligned_divisor(S, 512) or 512
    n_blocks = -(-S // block_s)
    S_pad = n_blocks * block_s
    tau = jnp.asarray(unit_tau, jnp.float32)
    nhi32 = jnp.asarray(nhi, jnp.float32)
    if S_pad != S:
        tau = jnp.concatenate(
            [tau, jnp.zeros((S_pad - S, P), jnp.float32)], axis=0
        )
        nhi32 = jnp.concatenate(
            [nhi32, jnp.zeros((S_pad - S,), jnp.float32)], axis=0
        )

    n_out = _out_width(P - 2 * width, out_dtype)
    out = pl.pallas_call(
        functools.partial(_abs_tail_kernel, taps=taps, width=width),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_s, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_s, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (S_pad, n_out), out_dtype or jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(tau, nhi32[:, None])
    return out[:S]


def _abs_windowed_kernel(
    far_ref, corr_ref, c0_ref, nhi_ref, out_ref, *, taps, width, num_lines, P
):
    """Window placement + exp(-nhi * tau) + 7-tap convolution in VMEM.

    The placement uses ``pltpu.repeat`` (corr half-window tiled across
    all chunks) masked by a chunk-id comparison — the XLA dense
    broadcast of the same math materializes (S, nc, 128) intermediates
    in HBM (profiled ~1.2 ms/spectrum)."""
    far = far_ref[:]  # (BS, P_pad)
    P_pad = far.shape[-1]
    nc = P_pad // 128
    chunk = jax.lax.broadcasted_iota(jnp.int32, (1, P_pad), 1) // 128
    tau = far
    for l in range(num_lines):
        c0 = c0_ref[:, l : l + 1]  # (BS, 1) int32
        corr0 = corr_ref[:, l * 256 : l * 256 + 128]
        corr1 = corr_ref[:, l * 256 + 128 : (l + 1) * 256]
        rep0 = pltpu.repeat(corr0, nc, axis=1)  # (BS, P_pad), p -> corr0[p%128]
        rep1 = pltpu.repeat(corr1, nc, axis=1)
        tau = (
            tau
            + jnp.where(chunk == c0, rep0, 0.0)
            + jnp.where(chunk == c0 + 1, rep1, 0.0)
        )
    raw = jnp.exp(-nhi_ref[:] * tau)
    n = P - 2 * width
    acc = taps[0] * raw[:, 0:n]
    for t in range(1, 2 * width + 1):
        acc = acc + taps[t] * raw[:, t : t + n]
    out_ref[:] = _encode_store(acc, out_ref.dtype)


def absorption_windowed_pallas(
    parts, nhi, interpret: bool = False, out_dtype=None
):
    """Fused broadened absorption from unplaced windowed-tau parts
    (ops/voigt.WindowedTauParts): placement + exp + broadening as one
    kernel.

    :return: (S, num_pixels - 6) broadened absorption.
    """
    return _absorption_windowed_pallas(
        parts.far, parts.corr, parts.c0, nhi,
        num_pixels=parts.num_pixels, interpret=interpret,
        out_dtype=out_dtype,
    )


@functools.lru_cache(maxsize=32)
def _window_poly_coeffs(y: float, u0: float = 9.0,
                        deg_disk: int = 16, deg_wing: int = 10):
    """Per-line polynomial fit of the window Faddeeva values for the
    fused kernel: with the Lorentzian width ``y`` a COMPILE-TIME
    constant per Lyman line, ``Re w(x + iy) = exp(-u) + y * R(u)``
    (u = x^2) where R is smooth and O(1)-ranged — no cancellation, so
    the f32 evaluation is MORE accurate near line cores than the f32
    Weideman rational (which assembles a ~1e-13-scale w from O(1)
    intermediates).  Two monomial fits (Chebyshev-derived, f32 Horner):

    * disk  u in [0, u0]:           R(s),  s = 2 u / u0 - 1
    * wing  u in [u0, CF_FAR^2]:    w = exp(-u) + y * t * S(st),
                                    t = 1/u, st = 2 u0 t - 1

    Measured f32 accuracy ~1e-6 relative across the whole window for
    the three production y_l (scan in PERFORMANCE.md round 4); the
    reference values come from scipy's f64 ``wofz`` at kernel TRACE
    time (lru-cached per ``y``), so the fit is independent of jax's
    x64 state.
    """
    from scipy.special import wofz

    from .voigt import CF_FAR_RADIUS

    u = np.linspace(0.0, u0, 30001)
    w = wofz(np.sqrt(u) + 1j * y).real
    R = (w - np.exp(-u)) / y
    s = 2.0 * u / u0 - 1.0
    cd = (
        np.polynomial.chebyshev.Chebyshev.fit(s, R, deg_disk)
        .convert(kind=np.polynomial.Polynomial)
        .coef.astype(np.float32)
    )
    uu = np.geomspace(u0, float(CF_FAR_RADIUS) ** 2, 30001)
    t = 1.0 / uu
    S = (wofz(np.sqrt(uu) + 1j * y).real - np.exp(-uu)) / (y * t)
    st = 2.0 * u0 * t - 1.0
    cw = (
        np.polynomial.chebyshev.Chebyshev.fit(st, S, deg_wing)
        .convert(kind=np.polynomial.Polynomial)
        .coef.astype(np.float32)
    )
    return tuple(float(c) for c in cd), tuple(float(c) for c in cw)


def _abs_all_kernel(
    wl_ref,  # (1, P_pad) padded wavelengths
    z_ref,  # (BS, 1) absorber redshifts
    c0_ref,  # (BS, L) int32 window start chunk per line
    *refs,  # F nhi inputs (BS, 1), then F outputs (BS, n_out)
    taps,
    width,
    num_lines,
    sigma,
    P,
    lls_break,
    poly,
):
    """The ENTIRE windowed Voigt absorption in one kernel: far-field
    rational + per-line window Weideman/CF corrections + placement +
    exp + 7-tap instrumental convolution + storage encode, for every
    column-density family sharing the redshift samples.

    The XLA composition of the same math (ops/voigt._windowed_tau_parts
    feeding _abs_windowed_kernel) materializes the (S, P_pad) far field
    and the (S, L*256) window corrections in HBM and pays a fusion
    round trip per window step — profiled at ~1.4 ms/spectrum of the
    4.8 ms budget (PERFORMANCE.md round 4).  Here every intermediate
    lives in VMEM/registers; the only HBM traffic is z/nhi/c0 in and
    the encoded profiles out.

    Window extraction is the placement trick run in reverse: with
    window starts chunk-aligned, ``x_win = sum_j (c0 == j) *
    x[:, 128j : 128j + 256]`` over the nc-1 candidate chunks is an
    unrolled select+add over VMEM tiles (exactly one nonzero term per
    row), dodging both the Mosaic per-row dynamic-slice loop (the
    original kernel's serialization) and the XLA one-hot MXU fetch.
    """
    from .voigt import CF_FAR_RADIUS, FAR_FIELD_LINES

    dtype = jnp.float32
    F = len(refs) // 2
    nhi_refs = refs[:F]
    out_refs = refs[F:]
    wl = wl_ref[:]  # (1, P_pad)
    P_pad = wl.shape[1]
    nc = P_pad // 128
    BS = z_ref.shape[0]
    inv = 1.0 / (jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma)
    c_cgs = jnp.asarray(C.SPEED_OF_LIGHT_CGS, dtype)
    sqrt_pi = jnp.asarray(jnp.sqrt(jnp.pi), dtype)
    one_plus_z = 1.0 + z_ref[:]  # (BS, 1)
    chunk = jax.lax.broadcasted_iota(jnp.int32, (1, P_pad), 1) // 128

    if lls_break:
        # Lyman-limit break opacity per unit column density
        # (reference: voigt_lls.py:254-363): tau_break = nhi / 10^17.2
        # * (lambda_rest / 911.7641)^3 for rest wavelengths below the
        # limit.  Linear in nhi, so it rides the shared unit tau;
        # (rest / limit) = wl / (limit * (1 + z)) needs only a (BS, 1)
        # reciprocal.
        t = wl * (1.0 / (911.7641 * one_plus_z))  # (BS, P_pad)
        tau = jnp.where(
            t > 1.0, 0.0, jnp.asarray(10.0**-17.2, dtype) * t * t * t
        )
    else:
        tau = jnp.zeros((BS, P_pad), dtype)
    for l in range(num_lines):
        lam_l = jnp.asarray(C.LYMAN_WAVELENGTHS_A[l], dtype)
        lead_l = jnp.asarray(C.LYMAN_LEADING_CONSTANTS[l], dtype)
        gam_l = jnp.asarray(C.LYMAN_LORENTZIAN_WIDTHS[l], dtype)
        amp = lead_l * inv / sqrt_pi
        y_l = gam_l * inv
        lam_c = lam_l * one_plus_z  # (BS, 1)

        x_all = (wl - lam_c) * (c_cgs / lam_c) * inv  # (BS, P_pad)
        r2_all = x_all * x_all + y_l * y_l
        if l < FAR_FIELD_LINES:
            # far wings as the direct Lorentzian rational: relative
            # error <= 1/(2|z|^2) ~ 7.6e-6 beyond CF_FAR_RADIUS
            # (ops/voigt.py far-field comment)
            far = r2_all > CF_FAR_RADIUS * CF_FAR_RADIUS
            tau = tau + amp * jnp.where(far, y_l / (sqrt_pi * r2_all), 0.0)

        # extract this line's 256-px window (one nonzero term per row)
        c0 = c0_ref[:, l : l + 1]  # (BS, 1)
        x_win = jnp.zeros((BS, WINDOW), dtype)
        for j in range(nc - 1):
            x_win = x_win + jnp.where(
                c0 == j, x_all[:, 128 * j : 128 * j + WINDOW], 0.0
            )
        ax = jnp.abs(x_win)
        r2 = ax * ax + y_l * y_l
        y_win = jnp.full_like(x_win, y_l)
        if poly:
            # Per-line polynomial Faddeeva (see _window_poly_coeffs):
            # ~35 flops/px replace the ~210-flop Weideman + full-K CF
            # blend, at BETTER near-core accuracy (exp(-u) carries the
            # Gaussian core at full relative precision — no
            # cancellation).  y_l is a compile-time constant, so the
            # fit is exact in y.
            u0 = 9.0
            y_py = float(C.LYMAN_LORENTZIAN_WIDTHS[l]) * (
                1.0 / (float(np.sqrt(2.0)) * sigma)
            )
            cd, cw = _window_poly_coeffs(y_py, u0)
            u = ax * ax
            eu = jnp.exp(-u)
            s = u * jnp.asarray(2.0 / u0, dtype) - 1.0
            disk = jnp.full_like(u, cd[-1])
            for c in cd[-2::-1]:
                disk = disk * s + c
            disk = eu + y_l * disk
            t = 1.0 / jnp.maximum(u, u0)
            st = t * jnp.asarray(2.0 * u0, dtype) - 1.0
            wing = jnp.full_like(u, cw[-1])
            for c in cw[-2::-1]:
                wing = wing * st + c
            wing = eu + y_l * t * wing
            in_win = r2 <= CF_FAR_RADIUS * CF_FAR_RADIUS
            corr = amp * jnp.where(
                in_win, jnp.where(u <= u0, disk, wing), 0.0
            )
        else:
            inner = r2 <= RADIUS * RADIUS
            annulus = (~inner) & (r2 <= CF_FAR_RADIUS * CF_FAR_RADIUS)
            wei, _ = _wofz_weideman(jnp.where(inner, ax, 0.0), y_win)
            cf, _ = _wofz_cf(ax, y_win)  # full K
            corr = amp * (
                jnp.where(inner, wei, 0.0) + jnp.where(annulus, cf, 0.0)
            )  # (BS, WINDOW)

        # place the window back into the full row (chunks c0, c0 + 1)
        rep0 = pltpu.repeat(corr[:, :128], nc, axis=1)
        rep1 = pltpu.repeat(corr[:, 128:], nc, axis=1)
        tau = (
            tau
            + jnp.where(chunk == c0, rep0, 0.0)
            + jnp.where(chunk == c0 + 1, rep1, 0.0)
        )

    n = P - 2 * width
    for nhi_ref, out_ref in zip(nhi_refs, out_refs):
        raw = jnp.exp(-nhi_ref[:] * tau)
        acc = taps[0] * raw[:, 0:n]
        for t in range(1, 2 * width + 1):
            acc = acc + taps[t] * raw[:, t : t + n]
        out_ref[:] = _encode_store(acc, out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_lines", "num_pixels", "interpret", "out_dtype",
        "lls_break", "poly",
    ),
)
def _absorption_all_pallas(
    wl_pad,
    z_absorber,
    c0,
    nhis,
    num_lines: int,
    num_pixels: int,
    interpret: bool = False,
    out_dtype=None,
    lls_break: bool = False,
    poly: bool = False,
):
    width = C.INSTRUMENT_PROFILE_HALF_WIDTH
    taps = tuple(float(t) for t in C.INSTRUMENT_PROFILE)
    sigma = float(C.THERMAL_SIGMA_CGS)
    P = num_pixels
    P_pad = wl_pad.shape[0]
    S = z_absorber.shape[0]
    F = len(nhis)
    assert P_pad % 128 == 0 and c0.shape == (S, num_lines)

    block_s = largest_aligned_divisor(S, 512) or 512
    n_blocks = -(-S // block_s)
    S_pad = n_blocks * block_s
    z32 = jnp.asarray(z_absorber, jnp.float32)
    c0i = jnp.asarray(c0, jnp.int32)
    nhi32 = [jnp.asarray(nhi, jnp.float32) for nhi in nhis]
    if S_pad != S:
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros((S_pad - S,) + x.shape[1:], x.dtype)], axis=0
        )
        z32, c0i = zpad(z32), zpad(c0i)
        nhi32 = [zpad(nhi) for nhi in nhi32]

    n_out = _out_width(P - 2 * width, out_dtype)
    row = lambda i: (i, 0)
    outs = pl.pallas_call(
        functools.partial(
            _abs_all_kernel, taps=taps, width=width, num_lines=num_lines,
            sigma=sigma, P=P, lls_break=lls_break, poly=poly,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, P_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, num_lines), row, memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM)
            for _ in range(F)
        ],
        out_specs=[
            pl.BlockSpec((block_s, n_out), row, memory_space=pltpu.VMEM)
            for _ in range(F)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, n_out), out_dtype or jnp.float32)
            for _ in range(F)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(wl_pad[None, :], z32[:, None], c0i, *[nhi[:, None] for nhi in nhi32])
    return tuple(out[:S] for out in outs)


def absorption_all_pallas(
    wavelengths,
    z_absorber,
    nhis,
    num_lines: int = 3,
    interpret: bool = False,
    out_dtype=None,
    lls_break: bool = False,
    poly: bool | None = None,
):
    """Fully fused windowed Voigt absorption: one kernel computes the
    broadened, storage-encoded (S, P - 6) absorption profiles for every
    column-density family in ``nhis`` from the shared redshift samples.

    Replaces the ``_windowed_tau_parts`` + ``absorption_windowed_pallas``
    composition on the hot path (same math as the non-tier windowed
    XLA formulation; parity pinned by tests/test_voigt.py).

    The in-kernel two-tier window evaluation that shipped in round 4
    (GPY_DLA_FUSED_TIER) was measured SLOWER than the full-window blend
    (206.6 vs 219.0 spectra/s/chip — in VMEM the flops the tier saves
    are cheaper than its 32-lane masked extraction/placement ops, the
    opposite economics of the XLA WINDOW_TIER, where every fusion is an
    HBM round trip) and was removed in round 5; PERFORMANCE.md keeps
    the measurement.

    :param nhis: tuple of (S,) column-density arrays (e.g. the DLA and
        subDLA sample sets, which share their z offsets —
        reference: multi_dlas/set_lls_parameters.m:22,59).
    :return: tuple of (S, P - 6) profiles, one per family.
    """
    from .kernel_config import FUSED_POLY
    from .voigt import window_chunk_starts

    if poly is None:
        poly = FUSED_POLY
    wl_pad, c0 = window_chunk_starts(wavelengths, z_absorber, num_lines)
    return _absorption_all_pallas(
        wl_pad,
        z_absorber,
        c0,
        tuple(nhis),
        num_lines=num_lines,
        num_pixels=wavelengths.shape[0],
        interpret=interpret,
        out_dtype=out_dtype,
        lls_break=lls_break,
        poly=poly,
    )


@functools.partial(
    jax.jit, static_argnames=("num_pixels", "interpret", "out_dtype")
)
def _absorption_windowed_pallas(
    far, corr, c0, nhi, num_pixels: int, interpret: bool = False,
    out_dtype=None,
):
    width = C.INSTRUMENT_PROFILE_HALF_WIDTH
    taps = tuple(float(t) for t in C.INSTRUMENT_PROFILE)
    P = num_pixels
    S, P_pad = far.shape
    L = c0.shape[1]
    assert P_pad % 128 == 0 and corr.shape[1] == L * 256

    block_s = largest_aligned_divisor(S, 512) or 512
    n_blocks = -(-S // block_s)
    S_pad = n_blocks * block_s
    far32 = jnp.asarray(far, jnp.float32)
    corr32 = jnp.asarray(corr, jnp.float32)
    c0i = jnp.asarray(c0, jnp.int32)
    nhi32 = jnp.asarray(nhi, jnp.float32)
    if S_pad != S:
        zpad = lambda x: jnp.concatenate(
            [x, jnp.zeros((S_pad - S,) + x.shape[1:], x.dtype)], axis=0
        )
        far32, corr32, c0i, nhi32 = map(zpad, (far32, corr32, c0i, nhi32))

    out = pl.pallas_call(
        functools.partial(
            _abs_windowed_kernel, taps=taps, width=width,
            num_lines=L, P=P,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_s, P_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, L * 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_s, _out_width(P - 2 * width, out_dtype)),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (S_pad, _out_width(P - 2 * width, out_dtype)),
            out_dtype or jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(far32, corr32, c0i, nhi32[:, None])
    return out[:S]
