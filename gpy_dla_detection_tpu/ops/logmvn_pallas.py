"""Pallas TPU kernel: fused batched low-rank MVN log-density.

The whole per-sample likelihood runs as one kernel that reads each
absorption block from HBM exactly once and emits a single scalar per
sample: noise assembly, capacitance matmul (MXU), projection of the
whitened residual, data-space quadratic form and log determinant, AND
the k x k Cholesky factorization with the forward substitution fused in
(unrolled rank-1 updates on the VMEM-resident capacitance block — XLA
refuses to fuse this chain and round-trips the (S, k, k) tensor through
HBM twenty times, measured at 35% of the whole pipeline).

Used automatically by ``batched_log_mvnpdf`` on TPU for float32 inputs;
the jnp path remains the reference implementation (and the CPU/f64
conformance path).

By default the evaluation is SPLIT in two kernels: stage A (per
(200, N) block) does the noise assembly and the MXU capacitance /
projection dots and writes (S, k*k)+(S, k)+(S, 2) intermediates to
HBM; stage B re-reads them in (1000, k*k) row blocks, TRANSPOSES each
block once in VMEM, and runs the serial factorization chain with
samples on lanes and a shrinking active triangle entirely as sublane
operations.  The rejected alternatives — a single fused kernel
(GPY_DLA_SPLIT_CHAIN=0), the row-layout chain (GPY_DLA_CHAIN_T=0), and
the four-dot rank-2 selection (GPY_DLA_CHAIN_DOT=separate) — were
measured slower (row layout relayouts the full lane dimension every
iteration: 0.976 -> 0.350 ms/call all-in at S=10k) and deleted in
round 5; PERFORMANCE.md keeps the numbers.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_config import ABS_I16_SCALE, largest_aligned_divisor
from .logmvn import LOG_2PI

# rank-2 steps in the transposed chain: factor columns (j, j+1) per
# iteration and apply ONE combined trailing update, halving the number
# of read-modify-write passes over the VMEM-resident T (the chain's
# dominant cost is exactly those passes; the arithmetic is unchanged).
# Requires even k; falls back to rank-1 otherwise.  Measured 0.332 vs
# 0.350 ms/call chain-only (kernel_ablate chain_xt2_1000), 130.7 ->
# 132.0 spectra/s/chip end to end; GPY_DLA_CHAIN_R2=0 restores rank-1.
_CHAIN_R2: bool = os.environ.get("GPY_DLA_CHAIN_R2", "1") == "1"

# packed-triangular capacitance: B is symmetric, so stage A computes
# only the k(k+1)/2 = 210 lower-triangle columns (3 bf16 matmul passes
# on half the lanes, half the B HBM round trip) and the chain runs
# directly on the packed staircase layout — the trailing update at
# iteration j touches (k-j)(k-j-1)/2 packed rows instead of (k-j-1)*k
# flat rows (sum k^3/6 vs k^3/2 lane work).  Split+transposed path
# only; rank-1 steps.  Measured: chain 0.332 (rank-2 flat) -> 0.259
# ms/call (kernel_ablate chain_xtp_1000), bench 142.3 -> 156-160
# spectra/s/chip end to end.  GPY_DLA_PACKED=0 restores the flat
# layout (rank-2 flat chain).
_PACKED: bool = os.environ.get("GPY_DLA_PACKED", "1") == "1"

# 3-pass bf16 split for the projection dot u = r @ M (default on; see
# the comment at the use site in _assemble).  GPY_DLA_U_SPLIT=0
# restores the 6-pass Precision.HIGHEST lowering.
_U_SPLIT: bool = os.environ.get("GPY_DLA_U_SPLIT", "1") == "1"

# sample-block size: multiple of the f32 sublane tile (8).  Keep the
# per-block live set (absorption block + ~6 elementwise temporaries +
# the (N, k^2) pair basis) under Mosaic's 64 MB scoped-vmem budget —
# 1000-row blocks overflow it (71.2 MB) once vmapped over a spectra
# batch, and oversized blocks send the allocator into pathological
# search.  400 was re-measured AFTER the kernel split (the old fused
# kernel regressed at 400 because the chain's SSA temporaries shared
# the block budget; the split cap stage has no chain live set):
# 141.0 (200) -> 142.3/141.4 (400) spectra/s/chip.
# GPY_DLA_BLOCK_S overrides for on-device block-size experiments.
BLOCK_S = int(os.environ.get("GPY_DLA_BLOCK_S", "400"))
# pixel count the BLOCK_S budget was sized for; wider windows scale
# the block down so BS * N stays within the same VMEM envelope
_BLOCK_BUDGET_N = 1280


def _block_s(n: int, s: int | None = None) -> int:
    """Sample-block size for an N-pixel problem: BLOCK_S at the budget
    width, scaled down (8-aligned, min 8) for wider windows so the
    kernel's VMEM live set stays within the envelope validated at
    200 x 1280 (under the explicit 64 MB vmem_limit below).

    When the sample count ``s`` is given, prefer the largest 8-aligned
    block <= the budget that DIVIDES s: at the reference's S=10,000 that
    is 200, which removes the 10,000 -> next-multiple pad + slice +
    copy pair the profiler measured at 12% of total device time
    (pad/copy/slice 177 ms of 1,472 ms over 3x32 spectra)."""
    if n <= _BLOCK_BUDGET_N:
        budget = BLOCK_S
    else:
        budget = max(8, (BLOCK_S * _BLOCK_BUDGET_N // n) // 8 * 8)
    if s is not None:
        b = largest_aligned_divisor(s, budget)
        if b is not None:
            return b
    return budget


def _chain_block_s(s_pad: int) -> int:
    """Sample-block size for the factorization-chain kernel: the
    largest 8-aligned divisor of the padded sample count <= 2048.  The
    chain kernel's live set is (bs, k^2)-shaped — no (BS, N) arrays —
    so blocks of 2,000 samples fit VMEM easily and amortize the
    serial chain's fixed per-iteration issue overhead over 10x more
    rows than the fused kernel's 200-row blocks (measured 1.536 ->
    1.310/1.345 ms/call at bs=2000/1000, S=10k,
    scripts/kernel_ablate.py).  Capped at 1024: the shrinking-triangle
    chain's unrolled SSA temporaries are all charged against Mosaic's
    scoped-vmem stack, and at bs=2000 the 64 MB accounting limit
    overflows (75.3 MB) once the kernel is vmapped over a spectra
    batch.  GPY_DLA_CHAIN_BS overrides for experiments (the rank-2
    chain halves the iteration count and with it the SSA stack)."""
    cap = int(os.environ.get("GPY_DLA_CHAIN_BS", "1024"))
    return largest_aligned_divisor(s_pad, cap) or s_pad


def _assemble(rows_ref, M_ref, Mp_hi_ref, Mp_lo_ref, a_ref, extra_refs,
              u_split: bool = _U_SPLIT):
    """Shared first half of the fused kernel and the split stage-A
    kernel: noise assembly + the MXU capacitance/projection dots on one
    (BS, N) absorption block.  Returns (B, u, quad0, logdet0, n) —
    the flat capacitance (BS, k*k) WITHOUT the +I, the projection
    (BS, k), the data-space quadratic form and log determinant, and the
    valid-pixel count.

    The five spectrum-level rows ride in ONE (8, N) block: five
    separate (1, N) inputs each pad to 8 sublanes in VMEM (40 KB apiece
    at N=1280).  ``extra_refs`` are chained-absorber streams multiplied
    into the absorption block in VMEM — the evidence loop passes the
    gathered per-level profile rows separately instead of materializing
    their running product in HBM (one full (S, N) read-modify-write
    pass per level >= 3 saved; see models/evidence.py, measured ~19 ms
    per level at S=10k, B=16).  The elementwise live set is kept
    minimal — Mosaic's stack accounting charges every named (BS, N)
    temporary against the scoped-VMEM limit.
    """
    rows = rows_ref[:]
    y = rows[0:1, :]
    mu = rows[1:2, :]
    omega2 = rows[2:3, :]
    v = rows[3:4, :]
    mask = rows[4:5, :]  # f32 0/1
    # absorption (and chained streams) may arrive in int16 fixed-point
    # storage (round(a * 32767)) or int32 PACKED i16-pair storage (two
    # codes per lane, contiguous halves — GPY_DLA_ABS_DTYPE,
    # models/evidence.py): decode in VMEM — the math stays f32, only
    # the HBM traffic (and the chained XLA gathers' element count)
    # shrinks
    def _decode(ref):
        if ref.dtype == jnp.int32:
            p = ref[:]
            lo = (p & 0xFFFF).astype(jnp.float32)
            hi = (p >> 16).astype(jnp.float32)
            return jnp.concatenate([lo, hi], axis=1) * (1.0 / ABS_I16_SCALE)
        x = ref[:].astype(jnp.float32)
        if ref.dtype == jnp.int16:
            x = x * (1.0 / ABS_I16_SCALE)
        return x

    a_raw = _decode(a_ref)  # (BS, N)
    for extra_ref in extra_refs:
        a_raw = a_raw * _decode(extra_ref)
    a = jnp.where(mask > 0, a_raw, 1.0)
    # masked pixels -> 0, with the denominator guarded like the XLA
    # path's d_safe: a masked pixel with v == 0 (or NaN) must not turn
    # d_inv into 0/0 = NaN on the kernel path only
    d = omega2 * a * a + v
    d_inv = mask / jnp.where(mask > 0, d, 1.0)
    delta = jnp.where(mask > 0, y - mu * a, 0.0)

    w = a * a * d_inv  # (BS, N)
    r = a * delta * d_inv

    # B = w @ M_pair as a manual 3-pass bf16 split at DEFAULT
    # precision: w = w_hi + w_lo (each bf16), M_pair pre-split by the
    # wrapper.  Dropping only the w_lo*Mp_lo term (~2^-16 relative),
    # this matches Precision.HIGHEST to the digit on the f64-reference
    # check (median |Δll| 3.6e-4 both ways — the error lives elsewhere)
    # while replacing the 6-pass HIGHEST lowering with 3 native bf16
    # passes: 0.54 -> 0.36 ms/call (scripts/kernel_ablate.py).
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    B = (
        jnp.dot(w_hi, Mp_hi_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(w_hi, Mp_lo_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(w_lo, Mp_hi_ref[:], preferred_element_type=jnp.float32)
    )  # (BS, k*k)
    if u_split:
        # same manual 3-pass bf16 split for the projection dot: HIGHEST
        # lowers the f32 dot to SIX MXU passes, and at k = 20 the lane
        # tile still pads to 128, so each pass costs like a 128-wide
        # dot — the u dot at HIGHEST was measured at parity with the
        # whole 256-lane-packed B dot (scripts/kernel_ablate.py).  The
        # in-kernel split of M is two elementwise ops on the (N, k)
        # operand, negligible next to the passes saved; dropping only
        # the lo*lo term is the identical ~2^-16-relative argument the
        # B dot's split rests on.  Measured vs an f64 oracle on
        # production-scale inputs (S=4096, N=1280, k=20, on-TPU):
        # split median |dll| 7.4e-4 / max 3.8e-3 vs HIGHEST 5.9e-4 /
        # 3.0e-3 on |ll| ~ 1.1e4 — both at the same ~1e-7 relative
        # floor set elsewhere in the f32 pipeline.
        M = M_ref[:]
        M_hi = M.astype(jnp.bfloat16)
        M_lo = (M - M_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        u = (
            jnp.dot(r_hi, M_hi, preferred_element_type=jnp.float32)
            + jnp.dot(r_hi, M_lo, preferred_element_type=jnp.float32)
            + jnp.dot(r_lo, M_hi, preferred_element_type=jnp.float32)
        )  # (BS, k)
    else:
        u = jnp.dot(
            r,
            M_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (BS, k)

    quad0 = jnp.sum(delta * delta * d_inv, axis=1, keepdims=True)  # (BS, 1)
    # log d = -log d_inv on valid pixels; masked entries contribute
    # log(0 + 1) = 0 (the +(mask <= 0) keeps the log's argument
    # positive so the inactive branch cannot produce NaN)
    logdet0 = -jnp.sum(jnp.log(d_inv + (mask <= 0)), axis=1, keepdims=True)
    n = jnp.sum(mask)
    return B, u, quad0, logdet0, n


def _make_cap_kernel(k: int, n_extra: int, u_split: bool = _U_SPLIT):
    """Stage-A kernel: noise assembly + MXU dots per (BS, N) block
    (:func:`_assemble`); writes the flat capacitance B, projection u,
    and the data-space quad/logdet scalars (with n log 2pi folded in)
    for stage B."""

    def _kernel(rows_ref, M_ref, Mp_hi_ref, Mp_lo_ref, a_ref, *rest):
        extra_refs = rest[:n_extra]
        B_ref, u_ref, misc_ref = rest[n_extra:]
        B, u, quad0, logdet0, n = _assemble(
            rows_ref, M_ref, Mp_hi_ref, Mp_lo_ref, a_ref, extra_refs,
            u_split=u_split,
        )
        B_ref[:] = B
        u_ref[:] = u
        misc_ref[:] = jnp.concatenate([quad0, logdet0 + n * LOG_2PI], axis=1)

    return _kernel


def _make_chain_kernel_t(k: int):
    """Transposed stage-B kernel: row-layout (bs, k*k) HBM blocks are
    transposed ONCE in VMEM at kernel entry, then the factorization
    runs with SAMPLES ON LANES.  Each lane owns one sample's serial
    factorization, so the per-iteration pivot reads, masks,
    pltpu.repeat tiling, and the shrinking-triangle slice (``T[k:, :]``)
    are all sublane operations — the lane dimension is never sliced or
    relayouted (the row layout pays a full cross-lane relayout per
    iteration: 0.976 -> 0.312 ms/call chain-only).  Reading row blocks
    and transposing in VMEM beats transposing in HBM between the
    stages: 0.350 ms/call all-in vs 0.312 + ~0.12 ms of XLA
    transpose+lane-pad copies, and it needs no 128-lane padding of the
    sample axis (scripts/kernel_ablate.py chain_xt_*).  Iteration j
    carries rows j*k.. (columns j.. of the symmetric capacitance); its
    local row 0 is original row j*k, so the pivot sits at local row
    j."""

    def _kernel(B_ref, u_ref, misc_ref, ll_ref):
        eye_col = (
            jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) // k
            == jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) % k
        ).astype(jnp.float32)
        T = B_ref[:].T + eye_col  # (k*k, bs)
        u = u_ref[:].T  # (k, bs)
        misc = misc_ref[:].T  # (2, bs)
        quad0 = misc[0:1, :]  # (1, bs)
        logdet0 = misc[1:2, :]
        sub = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(k):
            dj = T[j : j + 1, :]
            logdet = logdet + jnp.log(dj)
            inv_sqrt = jax.lax.rsqrt(dj)
            lower = (sub >= j).astype(jnp.float32)
            col = T[:k, :] * inv_sqrt * lower  # (k, bs)
            tj = u[j : j + 1, :] * inv_sqrt
            quad = quad + tj * tj
            u = u - tj * col
            rem = k - j - 1
            if rem:
                # outer product col col^T over the trailing blocks:
                # rep[q] = col[j+1 + q//k] (0/1 selection dot), tile[q]
                # = col[q % k] (sublane-axis repeat)
                i_idx = jax.lax.broadcasted_iota(jnp.int32, (rem * k, k), 0)
                p_idx = jax.lax.broadcasted_iota(jnp.int32, (rem * k, k), 1)
                Rj = (i_idx // k + j + 1 == p_idx).astype(jnp.float32)
                rep = jnp.dot(
                    Rj,
                    col,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                tile = pltpu.repeat(col, rem, axis=0)
                T = T[k:, :] - rep * tile
        ll = -0.5 * (quad0 - quad + logdet0 + logdet)  # (1, bs)
        ll_ref[:] = ll.T  # (bs, 1) row-layout output

    return _kernel


def _make_chain_kernel_t2(k: int):
    """Rank-2 transposed stage-B kernel: same layout as
    :func:`_make_chain_kernel_t` (samples on lanes after one in-VMEM
    block transpose), but each iteration factors columns (j, j+1) and
    subtracts BOTH outer products from the trailing triangle in one
    fused pass — T is read and written k/2 times instead of k.  Column
    j+1's own block is pre-updated with col_j first (a single (k, bs)
    expression), preserving the exact rank-1 arithmetic.  Requires even
    k (the wrapper falls back to the rank-1 chain otherwise)."""
    assert k % 2 == 0

    def _kernel(B_ref, u_ref, misc_ref, ll_ref):
        eye_col = (
            jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) // k
            == jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) % k
        ).astype(jnp.float32)
        T = B_ref[:].T + eye_col  # (k*k, bs)
        u = u_ref[:].T  # (k, bs)
        misc = misc_ref[:].T  # (2, bs)
        quad0 = misc[0:1, :]
        logdet0 = misc[1:2, :]
        sub = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(0, k, 2):
            # T holds columns j.. as k-row blocks; column j's diagonal
            # sits at local row j, column j+1's block at rows k..2k-1
            dj = T[j : j + 1, :]
            inv_j = jax.lax.rsqrt(dj)
            col_j = T[:k, :] * inv_j * (sub >= j).astype(jnp.float32)
            tj = u[j : j + 1, :] * inv_j
            u = u - tj * col_j
            # pre-update column j+1 with col_j's rank-1 term, then
            # factor it: L[j+1, j] is col_j's row j+1
            bcol = T[k : 2 * k, :] - col_j[j + 1 : j + 2, :] * col_j
            dj1 = bcol[j + 1 : j + 2, :]
            inv_j1 = jax.lax.rsqrt(dj1)
            col_j1 = bcol * inv_j1 * (sub >= j + 1).astype(jnp.float32)
            tj1 = u[j + 1 : j + 2, :] * inv_j1
            u = u - tj1 * col_j1
            quad = quad + tj * tj + tj1 * tj1
            logdet = logdet + jnp.log(dj) + jnp.log(dj1)
            rem = k - j - 2
            if rem:
                i_idx = jax.lax.broadcasted_iota(jnp.int32, (rem * k, k), 0)
                p_idx = jax.lax.broadcasted_iota(jnp.int32, (rem * k, k), 1)
                Rj = (i_idx // k + j + 2 == p_idx).astype(jnp.float32)
                rep_j = jnp.dot(
                    Rj,
                    col_j,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                rep_j1 = jnp.dot(
                    Rj,
                    col_j1,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                tile_j = pltpu.repeat(col_j, rem, axis=0)
                tile_j1 = pltpu.repeat(col_j1, rem, axis=0)
                T = T[2 * k :, :] - rep_j * tile_j - rep_j1 * tile_j1
        ll = -0.5 * (quad0 - quad + logdet0 + logdet)  # (1, bs)
        ll_ref[:] = ll.T  # (bs, 1) row-layout output

    return _kernel


def _packed_maps(k: int):
    """Column-major lower-triangle packing: packed row r holds matrix
    entry (a_r, j_r) with a >= j; column j's segment starts at
    off_j = j*k - j*(j-1)//2 and is CONTIGUOUS (rows a = j..k-1), so
    the chain's per-iteration column reads and staircase trailing
    updates are static sublane slices."""
    cols, rows_ = [], []
    for j in range(k):
        for a in range(j, k):
            cols.append(j)
            rows_.append(a)
    return cols, rows_


def packed_path_active() -> bool:
    """True when :func:`batched_log_mvnpdf_pallas` will run the
    packed-triangular capacitance path under the env defaults — i.e.
    when a packed pair basis (``packed_pair_basis``) is the layout to
    precompute."""
    return _PACKED


def packed_pair_basis(M):
    """Lower-triangle pair basis ``P[n, r] = M[n, a_r] M[n, j_r]`` in
    the packed staircase order of :func:`_packed_maps` — built directly
    from M's columns.  Selecting the 210 packed columns out of the flat
    (N, k^2) basis inside the kernel wrapper instead was a (210, B, N)
    XLA gather per likelihood call, 2.1 ms per 32-spectrum batch step
    x3 instances on the bench profile; here the per-spectrum basis is
    formed once and shared by all 5 likelihood calls."""
    k = M.shape[-1]
    cols_l, rows_l = _packed_maps(k)
    return M[:, np.asarray(rows_l)] * M[:, np.asarray(cols_l)]


def _make_chain_kernel_tp(k: int):
    """Packed transposed stage-B kernel: the factorization chain over
    the (P, bs) PACKED capacitance (P = k(k+1)/2), samples on lanes.

    Iteration j's column segment is packed rows 0..k-j-1 of the
    shrinking T (matrix rows a = j..k-1, pivot at local row 0 — no
    ``lower`` masking needed, the upper triangle is never stored), and
    the trailing update subtracts L[a,j]·L[b,j] from the remaining
    (k-j)(k-j-1)/2 packed rows via two 0/1 selection dots built from
    the packed (column, row) index vectors: rep[r] = col[b_r - j],
    tile[r] = col[a_r - j].  u shrinks in lockstep (row j is consumed
    at iteration j), so no zero-padding of the column is ever built.
    vs the flat transposed chain this is 3x less trailing lane work
    and 3x fewer selection-dot MACs (sum (k-j)^2 vs k^2 per level)."""
    P = k * (k + 1) // 2

    def _kernel(B_ref, u_ref, misc_ref, colidx_ref, rowidx_ref, ll_ref):
        colv = colidx_ref[:]  # (P, 1) i32: matrix column j of packed row
        rowv = rowidx_ref[:]  # (P, 1) i32: matrix row a of packed row
        # + I on the diagonal packed rows (a == j)
        T = B_ref[:].T + (rowv == colv).astype(jnp.float32)  # (P, bs)
        u = u_ref[:].T  # (k, bs)
        misc = misc_ref[:].T  # (2, bs)
        quad0 = misc[0:1, :]
        logdet0 = misc[1:2, :]
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(k):
            seg = k - j
            dj = T[0:1, :]
            logdet = logdet + jnp.log(dj)
            inv_sqrt = jax.lax.rsqrt(dj)
            col = T[0:seg, :] * inv_sqrt  # (seg, bs): L[j.., j]
            tj = u[0:1, :] * inv_sqrt
            quad = quad + tj * tj
            if seg > 1:
                u = u[1:, :] - tj * col[1:, :]
            rem_p = (seg - 1) * seg // 2
            if rem_p:
                colv = colv[seg:, :]
                rowv = rowv[seg:, :]
                c_iota = jax.lax.broadcasted_iota(jnp.int32, (rem_p, seg), 1)
                R1 = (colv - j == c_iota).astype(jnp.float32)
                R2 = (rowv - j == c_iota).astype(jnp.float32)
                rep = jnp.dot(
                    R1, col,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                tile = jnp.dot(
                    R2, col,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                T = T[seg:, :] - rep * tile
        ll = -0.5 * (quad0 - quad + logdet0 + logdet)  # (1, bs)
        ll_ref[:] = ll.T  # (bs, 1)

    return _kernel


def _split3_bf16(x):
    """Exact 3-plane bf16 decomposition of an f32 array: hi = bf16(x),
    mid = bf16(x - hi), lo = x - hi - mid.  3 x 8 mantissa bits cover
    f32's 24, so summing the three planes (in f32) reconstructs x to
    the last bit for normal values — a 0/1 selection matrix (exact in
    bf16) times the planes therefore equals the HIGHEST-precision dot
    at half the MXU passes (3 DEFAULT vs 6)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _make_chain_kernel_tp2c(k: int):
    """Combined-dot rank-2 packed transposed stage-B kernel: rank-2
    packed-staircase factorization (two columns per iteration, exact
    rank-1 arithmetic), where each iteration's FOUR selection dots
    (rep/tile for columns j and j+1, each a 6-pass HIGHEST issue — the
    round-4 "separate" kernel, deleted) collapse into ONE block-diagonal
    0/1 selector
    multiplied against the stacked [col_j; col_j1] at 3 exact
    bf16-split passes — 40 x 6 MXU issues per block become 10 x 3.  The
    selector's left half picks col_j entries (lanes 0..seg-1), the
    right half col_j1 entries (lanes seg..2seg-2); output row blocks
    are rep_j / tile_j / rep_j1 / tile_j1."""
    assert k % 2 == 0
    P = k * (k + 1) // 2

    def _kernel(B_ref, u_ref, misc_ref, colidx_ref, rowidx_ref, ll_ref):
        colv = colidx_ref[:]  # (P, 1) i32
        rowv = rowidx_ref[:]
        T = B_ref[:].T + (rowv == colv).astype(jnp.float32)  # (P, bs)
        u = u_ref[:].T  # (k, bs)
        misc = misc_ref[:].T
        quad0 = misc[0:1, :]
        logdet0 = misc[1:2, :]
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(0, k, 2):
            seg = k - j  # column j's packed segment length
            dj = T[0:1, :]
            inv_j = jax.lax.rsqrt(dj)
            col_j = T[0:seg, :] * inv_j  # rows a = j..k-1
            tj = u[0:1, :] * inv_j
            u = u[1:, :] - tj * col_j[1:, :]
            # column j+1's segment, pre-updated with col_j's rank-1 term
            bcol = T[seg : 2 * seg - 1, :] - col_j[1:2, :] * col_j[1:, :]
            dj1 = bcol[0:1, :]
            inv_j1 = jax.lax.rsqrt(dj1)
            col_j1 = bcol * inv_j1  # rows a = j+1..k-1
            tj1 = u[0:1, :] * inv_j1
            if j + 2 < k:  # final pair consumes u entirely
                u = u[1:, :] - tj1 * col_j1[1:, :]
            quad = quad + tj * tj + tj1 * tj1
            logdet = logdet + jnp.log(dj) + jnp.log(dj1)
            done = 2 * seg - 1  # packed rows consumed by columns j, j+1
            rem_p = P - (j * k - j * (j - 1) // 2) - done
            if rem_p:
                colv = colv[done:, :]
                rowv = rowv[done:, :]
                w = 2 * seg - 1  # lanes: col_j entries then col_j1's
                c_i = jax.lax.broadcasted_iota(jnp.int32, (rem_p, w), 1)
                # cast each block before the concat — Mosaic rejects a
                # sublane concat of i1 vectors followed by one cast
                # ("Invalid vector register cast")
                R = jnp.concatenate(
                    [
                        (colv - j == c_i).astype(jnp.bfloat16),  # rep_j
                        (rowv - j == c_i).astype(jnp.bfloat16),  # tile_j
                        (colv + (seg - j - 1) == c_i).astype(
                            jnp.bfloat16
                        ),  # rep_j1 (col_j1 lanes sit +seg to the right)
                        (rowv + (seg - j - 1) == c_i).astype(
                            jnp.bfloat16
                        ),  # tile_j1
                    ],
                    axis=0,
                )  # (4 rem_p, w)
                X = jnp.concatenate([col_j, col_j1], axis=0)  # (w, bs)
                xh, xm, xl = _split3_bf16(X)
                out = (
                    jnp.dot(R, xh, preferred_element_type=jnp.float32)
                    + jnp.dot(R, xm, preferred_element_type=jnp.float32)
                    + jnp.dot(R, xl, preferred_element_type=jnp.float32)
                )  # (4 rem_p, bs)
                rep_j = out[0:rem_p, :]
                tile_j = out[rem_p : 2 * rem_p, :]
                rep_j1 = out[2 * rem_p : 3 * rem_p, :]
                tile_j1 = out[3 * rem_p :, :]
                T = T[done:, :] - rep_j * tile_j - rep_j1 * tile_j1
        ll = -0.5 * (quad0 - quad + logdet0 + logdet)
        ll_ref[:] = ll.T

    return _kernel


def batched_log_mvnpdf_pallas(
    y, mu, M, omega2, v, mask, absorption, M_pair, k: int,
    interpret: bool = False, extra=None,
    chain_r2: bool | None = None, packed: bool | None = None,
    u_split: bool | None = None,
):
    """Fused TPU evaluation of the batched masked Woodbury log-density.

    Same contract as ops/logmvn.batched_log_mvnpdf (f32; ``interpret``
    runs the kernel through the Pallas interpreter so correctness tests
    can exercise it on the virtual CPU mesh).  ``extra`` is an optional
    (S, N) absorption factor — or a tuple of them — multiplied into the
    absorption block in VMEM.
    """
    N = y.shape[0]  # logical pixel count (packed arrays store N/2 lanes)
    S = absorption.shape[0]
    if extra is None:
        extras = ()
    elif isinstance(extra, (tuple, list)):
        extras = tuple(extra)
    else:
        extras = (extra,)
    block_s = _block_s(N, S)
    n_blocks = -(-S // block_s)
    S_pad = n_blocks * block_s

    def _fill_one(dtype):
        # padding rows must decode to absorption 1.0: raw storage pads
        # with ones, int16 fixed point with the full-scale code, packed
        # int32 with the code in both halves
        if dtype == jnp.int16:
            return int(ABS_I16_SCALE)
        if dtype == jnp.int32:
            code = int(ABS_I16_SCALE)
            return code | (code << 16)
        return 1.0

    if S_pad != S:
        pad = lambda x: jnp.concatenate(
            [
                x,
                jnp.full((S_pad - S, x.shape[1]), _fill_one(x.dtype), x.dtype),
            ],
            axis=0,
        )
        absorption = pad(absorption)
        extras = tuple(pad(e) for e in extras)

    rows = jnp.stack(
        [
            y.astype(jnp.float32),
            mu.astype(jnp.float32),
            omega2.astype(jnp.float32),
            v.astype(jnp.float32),
            mask.astype(jnp.float32),
        ]
    )  # (5, N)

    if chain_r2 is None:
        chain_r2 = _CHAIN_R2
    if packed is None:
        packed = _PACKED
    if u_split is None:
        u_split = _U_SPLIT

    Mp32 = M_pair.astype(jnp.float32)
    kk_packed = k * (k + 1) // 2
    pre_packed = k > 1 and M_pair.shape[1] == kk_packed
    cols_l, rows_l = _packed_maps(k)
    if packed and not pre_packed:
        packed_cols = np.asarray(
            [j * k + a for j, a in zip(cols_l, rows_l)], np.int32
        )
        Mp32 = Mp32[:, packed_cols]  # (N, k(k+1)/2)
    elif pre_packed and not packed:
        # a packed basis reached a flat-layout path (env override after
        # the caller precomputed): expand via the symmetric inverse map
        flat_cols = np.empty(k * k, np.int32)
        for r, (j, a) in enumerate(zip(cols_l, rows_l)):
            flat_cols[j * k + a] = r
            flat_cols[a * k + j] = r
        Mp32 = Mp32[:, flat_cols]
    kk = Mp32.shape[1]
    Mp_hi = Mp32.astype(jnp.bfloat16)
    Mp_lo = (Mp32 - Mp_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def blk_spec(x):
        w = x.shape[1]
        return pl.BlockSpec(
            (block_s, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    pair_spec = pl.BlockSpec((N, kk), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((5, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # rows
        pl.BlockSpec((N, k), lambda i: (0, 0), memory_space=pltpu.VMEM),  # M
        pair_spec,  # M_pair high bf16 half
        pair_spec,  # M_pair low bf16 half
        blk_spec(absorption),  # absorption
    ]
    args = [rows, M.astype(jnp.float32), Mp_hi, Mp_lo, absorption]
    for e in extras:
        in_specs.append(blk_spec(e))
        args.append(e)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    B, u, misc = pl.pallas_call(
        _make_cap_kernel(k, len(extras), u_split=u_split),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (block_s, kk), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_s, k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_s, 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S_pad, kk), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, 2), jnp.float32),
        ),
        compiler_params=vmem,
        interpret=interpret,
    )(*args)
    bs2 = _chain_block_s(S_pad)
    chain_args = (B, u, misc)
    chain_in_specs = [
        pl.BlockSpec((bs2, kk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs2, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if packed:
        if chain_r2 and k % 2 == 0:
            chain_kernel = _make_chain_kernel_tp2c(k)
        else:
            chain_kernel = _make_chain_kernel_tp(k)
        colidx = jnp.asarray(cols_l, jnp.int32)[:, None]  # (P, 1)
        rowidx = jnp.asarray(rows_l, jnp.int32)[:, None]
        chain_args = chain_args + (colidx, rowidx)
        idx_spec = pl.BlockSpec(
            (kk, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        chain_in_specs += [idx_spec, idx_spec]
    elif chain_r2 and k % 2 == 0:
        chain_kernel = _make_chain_kernel_t2(k)
    else:
        chain_kernel = _make_chain_kernel_t(k)
    (ll,) = pl.pallas_call(
        chain_kernel,
        grid=(S_pad // bs2,),
        in_specs=chain_in_specs,
        out_specs=(
            pl.BlockSpec((bs2, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((S_pad, 1), jnp.float32),),
        compiler_params=vmem,
        interpret=interpret,
    )(*chain_args)
    return ll[:S, 0]
