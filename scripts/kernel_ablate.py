"""Ablation microbench of the Pallas likelihood kernel's internal
stages: elementwise-only, +matmuls, +Cholesky chain (= full).

Measures amortized wall time over many calls with DIFFERENT inputs
(block_until_ready is unreliable on this platform — verify skill)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpy_dla_detection_tpu.ops.logmvn import LOG_2PI

S, N, K = 10000, 1280, 20
BS = 200


def make_kernel(stage: str):
    k = K

    def _kernel(rows_ref, M_ref, Mp_ref, a_ref, ll_ref):
        rows = rows_ref[:]
        y = rows[0:1, :]
        mu = rows[1:2, :]
        omega2 = rows[2:3, :]
        v = rows[3:4, :]
        mask = rows[4:5, :]
        a_raw = a_ref[:]
        a = jnp.where(mask > 0, a_raw, 1.0)
        d_inv = mask / (omega2 * a * a + v)
        delta = jnp.where(mask > 0, y - mu * a, 0.0)
        w = a * a * d_inv
        r = a * delta * d_inv
        quad0 = jnp.sum(delta * delta * d_inv, axis=1, keepdims=True)
        logdet0 = -jnp.sum(jnp.log(d_inv + (mask <= 0)), axis=1, keepdims=True)
        if stage == "elementwise":
            ll_ref[:] = quad0 + logdet0 + jnp.sum(w + r, axis=1, keepdims=True)
            return
        if stage == "elementwise_nolog":
            # logdet replaced by a plain sum — isolates the per-element
            # transcendental's share of the elementwise stage
            ll_ref[:] = quad0 + jnp.sum(
                d_inv + w + r, axis=1, keepdims=True
            )
            return
        B = jnp.dot(w, Mp_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        u = jnp.dot(r, M_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        if stage == "matmul":
            ll_ref[:] = (quad0 + logdet0 + jnp.sum(B, axis=1, keepdims=True)
                         + jnp.sum(u, axis=1, keepdims=True))
            return
        if stage == "matmul_default":
            # same dots at DEFAULT precision (accuracy-invalid; timing only)
            B = jnp.dot(w, Mp_ref[:], preferred_element_type=jnp.float32)
            u = jnp.dot(r, M_ref[:], preferred_element_type=jnp.float32)
            ll_ref[:] = (quad0 + logdet0 + jnp.sum(B, axis=1, keepdims=True)
                         + jnp.sum(u, axis=1, keepdims=True))
            return
        if stage in ("matmul_split", "full_split", "full_split2"):
            # 3-pass bf16 split of the big B dot at DEFAULT precision
            Mp = Mp_ref[:]
            Mp_hi = Mp.astype(jnp.bfloat16)
            Mp_lo = (Mp - Mp_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            B = (
                jnp.dot(w_hi, Mp_hi, preferred_element_type=jnp.float32)
                + jnp.dot(w_hi, Mp_lo, preferred_element_type=jnp.float32)
                + jnp.dot(w_lo, Mp_hi, preferred_element_type=jnp.float32)
            )
            if stage == "matmul_split":
                ll_ref[:] = (quad0 + logdet0 + jnp.sum(B, axis=1, keepdims=True)
                             + jnp.sum(u, axis=1, keepdims=True))
                return
        if stage in ("full_tri", "full_tri_split"):
            # shrinking-triangle chain: only the not-yet-final columns
            # are updated; T holds columns j.. of A as (BS, (k-j)*k)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
            eye_head = (
                jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
                == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
            ).astype(jnp.float32)
            T = B + eye_head
            quad = jnp.zeros_like(quad0)
            logdet = jnp.zeros_like(logdet0)
            for j in range(k):
                dj = T[:, j : j + 1]
                logdet = logdet + jnp.log(dj)
                inv_sqrt = jax.lax.rsqrt(dj)
                lower = (lane >= j).astype(jnp.float32)
                col = T[:, :k] * inv_sqrt * lower
                tj = u[:, j : j + 1] * inv_sqrt
                quad = quad + tj * tj
                u = u - tj * col
                rem = k - j - 1
                if rem:
                    i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 0)
                    p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 1)
                    Rj = (p_idx // k + j + 1 == i_idx).astype(jnp.float32)
                    rep = jnp.dot(col, Rj, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, rem, axis=1)
                    T = T[:, k:] - rep * tile
            n = jnp.sum(mask)
            ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet + n * LOG_2PI)
            return
        if stage == "full_ilp2":
            h = BS // 2
            p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 1)
            i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 0)
            R = (p_idx // k == i_idx).astype(jnp.float32)
            eye_flat = (
                jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
                == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
            ).astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
            As = [B[:h] + eye_flat, B[h:] + eye_flat]
            us = [u[:h], u[h:]]
            quads = [jnp.zeros((h, 1), jnp.float32) for _ in range(2)]
            logds = [jnp.zeros((h, 1), jnp.float32) for _ in range(2)]
            for j in range(k):
                base = j * k
                for c in range(2):
                    A = As[c]
                    dj = A[:, base + j : base + j + 1]
                    logds[c] = logds[c] + jnp.log(dj)
                    inv_sqrt = jax.lax.rsqrt(dj)
                    lower = (lane >= j).astype(jnp.float32)
                    col = A[:, base : base + k] * inv_sqrt * lower
                    tj = us[c][:, j : j + 1] * inv_sqrt
                    quads[c] = quads[c] + tj * tj
                    us[c] = us[c] - tj * col
                    if j < k - 1:
                        rep = jnp.dot(col, R,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
                        tile = pltpu.repeat(col, k, axis=1)
                        As[c] = A - rep * tile
            quad = jnp.concatenate([quads[0], quads[1]], axis=0)
            logdet = jnp.concatenate([logds[0], logds[1]], axis=0)
            n = jnp.sum(mask)
            ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet + n * LOG_2PI)
            return
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 1)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 0)
        R = (p_idx // k == i_idx).astype(jnp.float32)
        eye_flat = (
            jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
            == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        A = B + eye_flat
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(k):
            base = j * k
            dj = A[:, base + j : base + j + 1]
            logdet = logdet + jnp.log(dj)
            inv_sqrt = jax.lax.rsqrt(dj)
            lower = (lane >= j).astype(jnp.float32)
            col = A[:, base : base + k] * inv_sqrt * lower
            tj = u[:, j : j + 1] * inv_sqrt
            quad = quad + tj * tj
            u = u - tj * col
            if j < k - 1:
                if stage == "chain_nodot":
                    tile = pltpu.repeat(col, k, axis=1)
                    A = A - tile * tile  # WRONG math; measures chain w/o dot
                elif stage == "full_split2":
                    col_hi = col.astype(jnp.bfloat16)
                    col_lo = (col - col_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    Rb = R.astype(jnp.bfloat16)
                    rep = (jnp.dot(col_hi, Rb, preferred_element_type=jnp.float32)
                           + jnp.dot(col_lo, Rb, preferred_element_type=jnp.float32))
                    tile = pltpu.repeat(col, k, axis=1)
                    A = A - rep * tile
                else:
                    rep = jnp.dot(col, R, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, k, axis=1)
                    A = A - rep * tile
        n = jnp.sum(mask)
        ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet + n * LOG_2PI)

    return _kernel


def build_decoupled(bs2: int, tri: bool = False):
    """Two-kernel split: kernel A (per 200 x N block) does the
    elementwise assembly + MXU dots and writes B/u/quad0/logdet0 to HBM;
    kernel B runs the serial Cholesky chain over (bs2, k*k) blocks —
    no (BS, N) live set, so the chain's per-issue latency amortizes over
    10x more rows.  Extra HBM: ~(S, k*k+k+2) f32 written+read = ~34 MB
    round trip per call (~40 us at HBM peak)."""
    k = K

    def ka(rows_ref, M_ref, Mp_hi_ref, Mp_lo_ref, a_ref, B_ref, u_ref, misc_ref):
        rows = rows_ref[:]
        y = rows[0:1, :]
        mu = rows[1:2, :]
        omega2 = rows[2:3, :]
        v = rows[3:4, :]
        mask = rows[4:5, :]
        a = jnp.where(mask > 0, a_ref[:], 1.0)
        d_inv = mask / (omega2 * a * a + v)
        delta = jnp.where(mask > 0, y - mu * a, 0.0)
        w = a * a * d_inv
        r = a * delta * d_inv
        quad0 = jnp.sum(delta * delta * d_inv, axis=1, keepdims=True)
        logdet0 = -jnp.sum(jnp.log(d_inv + (mask <= 0)), axis=1, keepdims=True)
        n = jnp.sum(mask)
        w_hi = w.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        B_ref[:] = (
            jnp.dot(w_hi, Mp_hi_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, Mp_lo_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, Mp_hi_ref[:], preferred_element_type=jnp.float32)
        )
        u_ref[:] = jnp.dot(r, M_ref[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        misc_ref[:] = jnp.concatenate(
            [quad0, logdet0 + n * LOG_2PI], axis=1)

    def kb(B_ref, u_ref, misc_ref, ll_ref):
        u = u_ref[:]
        misc = misc_ref[:]
        quad0 = misc[:, 0:1]
        logdet0 = misc[:, 1:2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        if tri:
            eye_head = (
                jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
                == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
            ).astype(jnp.float32)
            T = B_ref[:] + eye_head
            for j in range(k):
                dj = T[:, j : j + 1]
                logdet = logdet + jnp.log(dj)
                inv_sqrt = jax.lax.rsqrt(dj)
                lower = (lane >= j).astype(jnp.float32)
                col = T[:, :k] * inv_sqrt * lower
                tj = u[:, j : j + 1] * inv_sqrt
                quad = quad + tj * tj
                u = u - tj * col
                rem = k - j - 1
                if rem:
                    i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 0)
                    p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 1)
                    Rj = (p_idx // k + j + 1 == i_idx).astype(jnp.float32)
                    rep = jnp.dot(col, Rj, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, rem, axis=1)
                    T = T[:, k:] - rep * tile
        else:
            p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 1)
            i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * k), 0)
            R = (p_idx // k == i_idx).astype(jnp.float32)
            eye_flat = (
                jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
                == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
            ).astype(jnp.float32)
            A = B_ref[:] + eye_flat
            for j in range(k):
                base = j * k
                dj = A[:, base + j : base + j + 1]
                logdet = logdet + jnp.log(dj)
                inv_sqrt = jax.lax.rsqrt(dj)
                lower = (lane >= j).astype(jnp.float32)
                col = A[:, base : base + k] * inv_sqrt * lower
                tj = u[:, j : j + 1] * inv_sqrt
                quad = quad + tj * tj
                u = u - tj * col
                if j < k - 1:
                    rep = jnp.dot(col, R, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, k, axis=1)
                    A = A - rep * tile
        ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet)

    blk = pl.BlockSpec((BS, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs_a = [
        pl.BlockSpec((5, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        blk,
    ]

    @jax.jit
    def f(rows, M, Mp, a):
        Mp_hi = Mp.astype(jnp.bfloat16)
        Mp_lo = (Mp - Mp_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        B, u, misc = pl.pallas_call(
            ka,
            grid=(S // BS,),
            in_specs=in_specs_a,
            out_specs=(
                pl.BlockSpec((BS, K * K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BS, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BS, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((S, K * K), jnp.float32),
                jax.ShapeDtypeStruct((S, K), jnp.float32),
                jax.ShapeDtypeStruct((S, 2), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(rows, M, Mp_hi, Mp_lo, a)
        (ll,) = pl.pallas_call(
            kb,
            grid=(S // bs2,),
            in_specs=[
                pl.BlockSpec((bs2, K * K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bs2, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bs2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((bs2, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),),
            out_shape=(jax.ShapeDtypeStruct((S, 1), jnp.float32),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(B, u, misc)
        return ll

    return f


def build_chain_only(bs2: int, variant: str):
    """Stage-B (factorization chain) in isolation, fed precomputed
    B/u/misc — measures the chain's cost without the capacitance stage.

    variant:
      row    — production orientation: (S, k*k) blocks, samples on
               sublanes, k*k on lanes; shrinking triangle.  Every
               iteration's ``T[:, k:]`` slice shifts the whole tile by
               k=20 LANES — a full cross-lane relayout per iteration.
      xt     — row-layout HBM blocks, transposed IN VMEM at kernel
               entry (one tile relayout per block), then the T_tri
               math; avoids the XLA transpose + lane pad between the
               stages entirely.
      T_full — transposed: (k*k, bs) blocks, samples on LANES.  The
               tail update touches the full tile but involves no
               slicing at all (col is zero-masked below the pivot, so
               the outer product vanishes outside the trailing block);
               tile/rep build along SUBLANES (axis-0 repeat + one
               constant-matrix MXU dot with the contraction on k).
      T_tri  — transposed + shrinking triangle via sublane slices.
    """
    k = K

    def kb_row(B_ref, u_ref, misc_ref, ll_ref):
        u = u_ref[:]
        misc = misc_ref[:]
        quad0 = misc[:, 0:1]
        logdet0 = misc[:, 1:2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        eye_head = (
            jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) // k
            == jax.lax.broadcasted_iota(jnp.int32, (1, k * k), 1) % k
        ).astype(jnp.float32)
        T = B_ref[:] + eye_head
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        for j in range(k):
            dj = T[:, j : j + 1]
            logdet = logdet + jnp.log(dj)
            inv_sqrt = jax.lax.rsqrt(dj)
            lower = (lane >= j).astype(jnp.float32)
            col = T[:, :k] * inv_sqrt * lower
            tj = u[:, j : j + 1] * inv_sqrt
            quad = quad + tj * tj
            u = u - tj * col
            rem = k - j - 1
            if rem:
                i_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 0)
                p_idx = jax.lax.broadcasted_iota(jnp.int32, (k, rem * k), 1)
                Rj = (p_idx // k + j + 1 == i_idx).astype(jnp.float32)
                rep = jnp.dot(col, Rj, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                tile = pltpu.repeat(col, rem, axis=1)
                T = T[:, k:] - rep * tile
        ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet)

    def kb_T(B_ref, u_ref, misc_ref, ll_ref):
        u = u_ref[:]  # (k, bs)
        quad0 = misc_ref[0:1, :]  # (1, bs)
        logdet0 = misc_ref[1:2, :]
        sub = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        eye_col = (
            jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) // k
            == jax.lax.broadcasted_iota(jnp.int32, (k * k, 1), 0) % k
        ).astype(jnp.float32)
        T = B_ref[:] + eye_col  # (k*k, bs)
        quad = jnp.zeros_like(quad0)
        logdet = jnp.zeros_like(logdet0)
        if variant == "T_tri":
            # iteration j carries rows j*k.. (columns j.. of A)
            for j in range(k):
                # T's local row 0 is original row j*k, so the pivot
                # (original row j*k+j) is local row j
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
                    i_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (rem * k, k), 0)
                    p_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (rem * k, k), 1)
                    Rj = (i_idx // k + j + 1 == p_idx).astype(jnp.float32)
                    rep = jnp.dot(Rj, col,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, rem, axis=0)
                    T = T[k:, :] - rep * tile
        else:  # T_full: no slicing anywhere, col's zero-mask confines
            # the outer product to the trailing block
            i_full = jax.lax.broadcasted_iota(jnp.int32, (k * k, k), 0)
            p_full = jax.lax.broadcasted_iota(jnp.int32, (k * k, k), 1)
            Rfull = (i_full // k == p_full).astype(jnp.float32)
            for j in range(k):
                dj = T[j * k + j : j * k + j + 1, :]  # (1, bs)
                logdet = logdet + jnp.log(dj)
                inv_sqrt = jax.lax.rsqrt(dj)
                lower = (sub >= j).astype(jnp.float32)
                col = T[j * k : j * k + k, :] * inv_sqrt * lower  # (k, bs)
                tj = u[j : j + 1, :] * inv_sqrt
                quad = quad + tj * tj
                u = u - tj * col
                if j < k - 1:
                    rep = jnp.dot(Rfull, col,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                    tile = pltpu.repeat(col, k, axis=0)
                    T = T - rep * tile
        ll_ref[:] = -0.5 * (quad0 - quad + logdet0 + logdet)

    def kb_xt2(B_ref, u_ref, misc_ref, ll_ref):
        # in-VMEM transpose + RANK-2 shrinking triangle: columns
        # (j, j+1) factored per iteration, one combined trailing pass
        from gpy_dla_detection_tpu.ops.logmvn_pallas import (
            _make_chain_kernel_t2,
        )

        _make_chain_kernel_t2(k)(B_ref, u_ref, misc_ref, ll_ref)

    def kb_xt(B_ref, u_ref, misc_ref, ll_ref):
        # row-layout blocks, transposed in VMEM once per block — the
        # PRODUCTION stage-B kernel, delegated so the ablation cannot
        # drift from what ships
        from gpy_dla_detection_tpu.ops.logmvn_pallas import (
            _make_chain_kernel_t,
        )

        _make_chain_kernel_t(k)(B_ref, u_ref, misc_ref, ll_ref)

    def kb_xtp(B_ref, u_ref, misc_ref, colidx_ref, rowidx_ref, ll_ref):
        # packed-triangular production kernel (GPY_DLA_PACKED); the
        # four-dot "xtp2" variant was deleted in round 5 (measured
        # slower than the combined dot — PERFORMANCE.md)
        from gpy_dla_detection_tpu.ops.logmvn_pallas import (
            _make_chain_kernel_tp,
            _make_chain_kernel_tp2c,
        )

        maker = {
            "xtp2c": _make_chain_kernel_tp2c,
        }.get(variant, _make_chain_kernel_tp)
        maker(k)(B_ref, u_ref, misc_ref, colidx_ref, rowidx_ref, ll_ref)

    # the lane (sample) dimension of a transposed block must be a
    # multiple of 128 (Mosaic); S=10000 has no such tiling, so the
    # transposed variants run padded to S_T=10240
    S_T = 10240
    vmem = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    if variant in ("xtp", "xtp2c"):
        P = K * (K + 1) // 2

        @jax.jit
        def fp(Bp, u, misc, colidx, rowidx):
            (ll,) = pl.pallas_call(
                kb_xtp,
                grid=(S // bs2,),
                in_specs=[
                    pl.BlockSpec((bs2, P), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(pl.BlockSpec((bs2, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM),),
                out_shape=(jax.ShapeDtypeStruct((S, 1), jnp.float32),),
                compiler_params=vmem,
            )(Bp, u, misc, colidx, rowidx)
            return ll

        return fp

    if variant in ("xt", "xt2"):

        @jax.jit
        def fx(B, u, misc):
            (ll,) = pl.pallas_call(
                kb_xt2 if variant == "xt2" else kb_xt,
                grid=(S // bs2,),
                in_specs=[
                    pl.BlockSpec((bs2, K * K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(pl.BlockSpec((bs2, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM),),
                out_shape=(jax.ShapeDtypeStruct((S, 1), jnp.float32),),
                compiler_params=vmem,
            )(B, u, misc)
            return ll

        return fx

    if variant == "row":

        @jax.jit
        def f(B, u, misc):
            (ll,) = pl.pallas_call(
                kb_row,
                grid=(S // bs2,),
                in_specs=[
                    pl.BlockSpec((bs2, K * K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bs2, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(pl.BlockSpec((bs2, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM),),
                out_shape=(jax.ShapeDtypeStruct((S, 1), jnp.float32),),
                compiler_params=vmem,
            )(B, u, misc)
            return ll

        return f

    @jax.jit
    def fT(BT, uT, miscT):
        (ll,) = pl.pallas_call(
            kb_T,
            grid=(S_T // bs2,),
            in_specs=[
                pl.BlockSpec((K * K, bs2), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bs2), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bs2), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((1, bs2), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),),
            out_shape=(jax.ShapeDtypeStruct((1, S_T), jnp.float32),),
            compiler_params=vmem,
        )(BT, uT, miscT)
        return ll

    return fT


def build(stage):
    blk = pl.BlockSpec((BS, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((5, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        blk,
    ]

    @jax.jit
    def f(rows, M, Mp, a):
        (ll,) = pl.pallas_call(
            make_kernel(stage),
            grid=(S // BS,),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((BS, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),),
            out_shape=(jax.ShapeDtypeStruct((S, 1), jnp.float32),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(rows, M, Mp, a)
        return ll

    return f


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        np.stack([
            rng.normal(1, 0.3, N), rng.normal(1, 0.3, N),
            rng.uniform(0.05, 0.2, N), rng.uniform(0.05, 0.2, N),
            np.ones(N),
        ]).astype(np.float32)
    )
    M = jnp.asarray(rng.normal(0, 0.2, (N, K)).astype(np.float32))
    Mp = jnp.asarray((np.asarray(M)[:, :, None] * np.asarray(M)[:, None, :])
                     .reshape(N, K * K))
    REPS = 30
    a_list = [
        jax.device_put(
            jnp.asarray(rng.uniform(0.5, 1.0, (S, N)).astype(np.float32))
        )
        for _ in range(8)
    ]
    rows = jax.device_put(rows); M = jax.device_put(M); Mp = jax.device_put(Mp)

    import glob, gzip, json

    def device_ms(trace_dir):
        files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                                 recursive=True))
        with gzip.open(files[-1], "rt") as fh:
            ev = json.load(fh)["traceEvents"]
        tot = 0.0
        for e in ev:
            if e.get("ph") == "X" and e.get("args", {}).get("hlo_category"):
                tot += e["dur"] / 1e3
        return tot

    # chain-only variants ("chain_<variant>_<bs>") get precomputed
    # SPD capacitances: B = G G^T + small diag jitter, flat (S, k*k)
    def chain_inputs(transposed: bool, seed: int):
        r2 = np.random.default_rng(seed)
        G = r2.normal(0, 1.0, (S, K, 6))
        Bm = np.einsum("ska,sla->skl", G, G) + (
            np.eye(K) * r2.uniform(1.0, 3.0, (S, 1, 1))
        )
        Bf = Bm.reshape(S, K * K).astype(np.float32)
        uf = r2.normal(0, 1.0, (S, K)).astype(np.float32)
        mf = r2.normal(0, 10.0, (S, 2)).astype(np.float32)
        if transposed:
            # pad the sample axis to 10240 (identity systems) so the
            # lane dimension tiles by 128
            pad = 10240 - S
            Bf = np.concatenate(
                [Bf, np.broadcast_to(
                    np.eye(K).reshape(1, K * K), (pad, K * K)
                ).astype(np.float32)], axis=0)
            uf = np.concatenate([uf, np.zeros((pad, K), np.float32)], axis=0)
            mf = np.concatenate([mf, np.zeros((pad, 2), np.float32)], axis=0)
            return (jax.device_put(jnp.asarray(Bf.T.copy())),
                    jax.device_put(jnp.asarray(uf.T.copy())),
                    jax.device_put(jnp.asarray(mf.T.copy())))
        return (jax.device_put(jnp.asarray(Bf)),
                jax.device_put(jnp.asarray(uf)),
                jax.device_put(jnp.asarray(mf)))

    def chain_inputs_packed(seed: int):
        from gpy_dla_detection_tpu.ops.logmvn_pallas import _packed_maps

        Bf, uf, mf = chain_inputs(False, seed)
        cols_l, rows_l = _packed_maps(K)
        packed_cols = np.asarray(
            [j * K + a for j, a in zip(cols_l, rows_l)], np.int32
        )
        Bp = jnp.asarray(np.asarray(Bf)[:, packed_cols])
        colidx = jnp.asarray(cols_l, jnp.int32)[:, None]
        rowidx = jnp.asarray(rows_l, jnp.int32)[:, None]
        return (jax.device_put(Bp), uf, mf,
                jax.device_put(colidx), jax.device_put(rowidx))

    # NB: decoupled_2500 no longer lowers (2500-row blocks violate the
    # 8-sublane divisibility rule); keep the default list to stages that
    # reflect the current production kernel split.
    stages = sys.argv[1:] or ["elementwise", "elementwise_nolog", "matmul",
                              "full_split2", "chain_xtp2c_2000"]
    row0 = None  # seed-0 row-layout oracle, compiled once across stages
    for stage in stages:
        if stage == "accuracy":
            continue  # handled by accuracy() below, not a timing stage
        if stage.startswith("chain_"):
            variant, bs2 = stage[len("chain_"):].rsplit("_", 1)
            f = build_chain_only(int(bs2), variant)
            if variant in ("xtp", "xtp2c"):
                ins = [chain_inputs_packed(s) for s in range(4)]
            else:
                ins = [
                    chain_inputs(variant not in ("row", "xt", "xt2"), s)
                    for s in range(4)
                ]
            out0 = np.asarray(f(*ins[0]))  # compile
            # cross-variant correctness: all variants factor the same
            # seed-0 SPD systems, so ll must agree with the row layout
            if row0 is None:
                f_row = build_chain_only(2000, "row")
                row0 = np.asarray(f_row(*chain_inputs(False, 0)))
            err = np.abs(out0.reshape(-1)[:S] - row0.reshape(-1)).max()
            assert err < 1e-3, f"{stage} mismatch vs row: {err}"
            tdir = f"/tmp/ablate_{stage}"
            os.system(f"rm -rf {tdir}")
            with jax.profiler.trace(tdir):
                outs = [f(*ins[i % 4]) for i in range(REPS)]
                for o in outs:
                    o.copy_to_host_async()
                for o in outs:
                    np.asarray(o)
            print(f"{stage:<20} {device_ms(tdir) / REPS:7.3f} ms/call device",
                  flush=True)
            continue
        if stage.startswith("decoupled"):
            parts = stage.split("_")
            f = build_decoupled(int(parts[-1]), tri="tri" in parts)
        else:
            f = build(stage)
        np.asarray(f(rows, M, Mp, a_list[0]))  # compile
        tdir = f"/tmp/ablate_{stage}"
        os.system(f"rm -rf {tdir}")
        with jax.profiler.trace(tdir):
            outs = [f(rows, M, Mp, a_list[i % 8]) for i in range(REPS)]
            for o in outs:
                o.copy_to_host_async()
            for o in outs:
                np.asarray(o)
        print(f"{stage:<20} {device_ms(tdir) / REPS:7.3f} ms/call device",
              flush=True)


def accuracy():
    rng = np.random.default_rng(1)
    rows_np = np.stack([
        rng.normal(1, 0.3, N), rng.normal(1, 0.3, N),
        rng.uniform(0.05, 0.2, N), rng.uniform(0.05, 0.2, N),
        np.ones(N),
    ]).astype(np.float32)
    M_np = rng.normal(0, 0.2, (N, K)).astype(np.float32)
    Mp_np = (M_np[:, :, None] * M_np[:, None, :]).reshape(N, K * K)
    a_np = rng.uniform(0.3, 1.0, (S, N)).astype(np.float32)

    f_full = build("full"); f_split = build("full_split2")
    f_dec = build_decoupled(2000)
    args = [jax.device_put(jnp.asarray(x)) for x in (rows_np, M_np, Mp_np, a_np)]
    ll_full = np.asarray(f_full(*args))[:, 0]
    ll_split = np.asarray(f_split(*args))[:, 0]
    ll_dec = np.asarray(f_dec(*args))[:, 0]

    # f64 reference
    y, mu, om, v, _ = rows_np.astype(np.float64)
    a = a_np.astype(np.float64); M64 = M_np.astype(np.float64)
    lls = np.empty(S)
    for s in range(0, S, 1000):
        sl = slice(s, s + 1000)
        d = om * a[sl] ** 2 + v
        delta = y - mu * a[sl]
        w64 = a[sl] ** 2 / d
        Bm = np.eye(K) + np.einsum("sn,ni,nj->sij", w64, M64, M64)
        u64 = np.einsum("sn,ni->si", a[sl] * delta / d, M64)
        L = np.linalg.cholesky(Bm)
        t = np.linalg.solve(L, u64[:, :, None])[:, :, 0]
        quad = (delta**2 / d).sum(1) - (t**2).sum(1)
        logdet = np.log(d).sum(1) + 2 * np.log(
            np.diagonal(L, axis1=1, axis2=2)).sum(1)
        lls[sl] = -0.5 * (quad + logdet + N * np.log(2 * np.pi))
    print("full   vs f64: median", np.median(np.abs(ll_full - lls)),
          "max", np.abs(ll_full - lls).max())
    print("split  vs f64: median", np.median(np.abs(ll_split - lls)),
          "max", np.abs(ll_split - lls).max())
    print("decoup vs f64: median", np.median(np.abs(ll_dec - lls)),
          "max", np.abs(ll_dec - lls).max())


if __name__ == "__main__":
    main()
    # the f64 accuracy sweep compiles 3 extra kernels; skip it when
    # ablating specific stages from the CLI
    if not sys.argv[1:] or "accuracy" in sys.argv[1:]:
        accuracy()
