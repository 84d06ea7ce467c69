"""Pallas TPU kernel: fused batched low-rank MVN log-density.

The (S, N)-heavy portion of the masked Woodbury chain — noise assembly,
capacitance matmul (MXU), projection of the whitened residual, data-
space quadratic form and log determinant — runs as one kernel that
reads each absorption block from HBM exactly once and emits only the
small per-sample quantities (B (S, k^2), u (S, k), quad0, logdet0).
The k x k factorize-and-solve then runs as the unrolled rank-1 update
loop in jnp (it is tiny).  The jnp composition in ops/logmvn.py
round-trips ~6 (S, N) temporaries through HBM; this path touches HBM
O(S*N) once.

Used automatically by ``batched_log_mvnpdf`` on TPU for float32 inputs;
the jnp path remains the reference implementation (and the CPU/f64
conformance path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .logmvn import LOG_2PI, batched_quad_logdet

# sample-block size: multiple of the f32 sublane tile (8).  Keep the
# per-block live set (absorption block + ~6 elementwise temporaries +
# the (N, k^2) pair basis) comfortably under the ~16 MB VMEM budget —
# oversized blocks send the Mosaic allocator into pathological search.
BLOCK_S = 128


def _kernel(y_ref, mu_ref, omega2_ref, v_ref, mask_ref, M_ref, Mp_ref, a_ref,
            B_ref, u_ref, scal_ref):
    mask = mask_ref[:]  # (1, N) f32 0/1
    y = y_ref[:]
    mu = mu_ref[:]
    omega2 = omega2_ref[:]
    v = v_ref[:]
    a_raw = a_ref[:]  # (BS, N)

    a = jnp.where(mask > 0, a_raw, 1.0)
    d = omega2 * a * a + v
    d_safe = jnp.where(mask > 0, d, 1.0)
    d_inv = mask / d_safe
    delta = jnp.where(mask > 0, y - mu * a, 0.0)

    w = a * a * d_inv  # (BS, N)
    r = a * delta * d_inv

    B_ref[:] = jnp.dot(
        w,
        Mp_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u_ref[:] = jnp.dot(
        r,
        M_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    quad0 = jnp.sum(delta * delta * d_inv, axis=1, keepdims=True)
    logdet0 = jnp.sum(
        jnp.where(mask > 0, jnp.log(d_safe), 0.0), axis=1, keepdims=True
    )
    scal_ref[:, 0:1] = quad0
    scal_ref[:, 1:2] = logdet0


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def batched_log_mvnpdf_pallas(
    y, mu, M, omega2, v, mask, absorption, M_pair, k: int, interpret: bool = False
):
    """Fused TPU evaluation of the batched masked Woodbury log-density.

    Same contract as ops/logmvn.batched_log_mvnpdf (f32; ``interpret``
    runs the kernel through the Pallas interpreter so correctness tests
    can exercise it on the virtual CPU mesh).
    """
    S, N = absorption.shape
    n_blocks = -(-S // BLOCK_S)
    S_pad = n_blocks * BLOCK_S
    if S_pad != S:
        absorption = jnp.concatenate(
            [absorption, jnp.ones((S_pad - S, N), absorption.dtype)], axis=0
        )

    mask_f = mask.astype(jnp.float32)[None, :]
    row = lambda x: x.astype(jnp.float32)[None, :]

    B, u, scal = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # y
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # mu
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # omega2
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # v
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec((N, k), lambda i: (0, 0), memory_space=pltpu.VMEM),  # M
            pl.BlockSpec((N, k * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_S, k * k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S_pad, k * k), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, 2), jnp.float32),
        ),
        interpret=interpret,
    )(
        row(y),
        row(mu),
        row(omega2),
        row(v),
        mask_f,
        M.astype(jnp.float32),
        M_pair.astype(jnp.float32),
        absorption,
    )

    B = B[:S].reshape(S, k, k) + jnp.eye(k, dtype=jnp.float32)
    corr, logdet_B = batched_quad_logdet(B, u[:S])
    quad0 = scal[:S, 0]
    logdet0 = scal[:S, 1]
    n = jnp.sum(mask)
    return -0.5 * (quad0 - corr + logdet0 + logdet_B + n * LOG_2PI)
