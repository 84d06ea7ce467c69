"""Microbench: u-space table interp vs the direct far-field evaluation.

The per-unit-NHI Lyman optical depth depends on (wavelength, z) only
through the rest-frame wavelength u = lambda / (1 + z), so the whole
(S, P) far-field pass — 16 lines x (S, P) masked Lorentzians, the bulk
of the Voigt fusion's device time — can be one 1-D table built per
spectrum plus a per-sample shifted linear interpolation (on the
log-uniform SDSS grid the fractional table index is p + shift_s,
separable; on any grid it is a_p + b_s).

This measures whether XLA's (S, P)-element gather from a small table
is fast enough on TPU to pay: interp traffic is 2 reads + 1 write per
element vs 16 masked rational evaluations per element.

Methodology per PERFORMANCE.md: wall clock around np.asarray with
DIFFERENT inputs per call (block_until_ready lies on axon).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gpy_dla_detection_tpu.ops.voigt import _windowed_tau_parts
    import gpy_dla_detection_tpu.constants as C

    S, P = 10_000, 1280
    reps = 6
    rng = np.random.default_rng(0)

    # log-uniform SDSS-like grid
    log_wl = np.log10(3800.0) + 1e-4 * np.arange(P)
    wl = jnp.asarray((10.0**log_wl).astype(np.float32))
    z_sets = [
        jnp.asarray(rng.uniform(2.2, 3.0, S).astype(np.float32))
        for _ in range(reps)
    ]

    sigma = C.THERMAL_SIGMA_CGS

    # ---- current path: full windowed parts (far field + windows) ----
    # reduce to a scalar ON DEVICE: materializing the (S, P) output
    # over the tunnel costs ~1 s/call and swamps the device time
    f_parts = jax.jit(
        lambda z: jnp.sum(_windowed_tau_parts(wl, z, 31, sigma).far)
    )
    np.asarray(f_parts(z_sets[0]))  # compile
    t0 = time.time()
    outs = [f_parts(z) for z in z_sets]
    for o in outs:
        np.asarray(o)
    t_parts = (time.time() - t0) / reps * 1e3

    # ---- table interp: separable index gather + lerp ----
    REFINE = 4
    G = (P + 1700) * REFINE + 2  # covers the z-shift span
    tab = jnp.asarray(rng.standard_normal(G).astype(np.float32))

    def interp(z):
        # fractional index: a_p + b_s (uniform grid: a_p = REFINE * p)
        a_p = jnp.arange(P, dtype=jnp.float32) * REFINE
        b_s = (jnp.log10(1.0 + z) - jnp.log10(1.0 + 2.2)) / 1e-4 * REFINE
        idx = a_p[None, :] + b_s[:, None]  # (S, P)
        i0 = jnp.clip(idx.astype(jnp.int32), 0, G - 2)
        frac = idx - i0.astype(jnp.float32)
        lo = jnp.take(tab, i0)
        hi = jnp.take(tab, i0 + 1)
        return jnp.sum(lo + frac * (hi - lo))

    f_interp = jax.jit(interp)
    np.asarray(f_interp(z_sets[0]))
    t0 = time.time()
    outs = [f_interp(z) for z in z_sets]
    for o in outs:
        np.asarray(o)
    t_interp = (time.time() - t0) / reps * 1e3

    # ---- table build cost (31 lines x G exact Faddeeva) ----
    from gpy_dla_detection_tpu.ops.voigt import (
        _unit_lyman_series_optical_depth,
    )

    u_grid = jnp.asarray(
        (10.0 ** (np.log10(3800.0 / 3.2) + 1e-4 / REFINE * np.arange(G)))
        .astype(np.float32)
    )
    f_tab = jax.jit(
        lambda shift: jnp.sum(_unit_lyman_series_optical_depth(
            u_grid * (1.0 + shift), jnp.zeros((1,), jnp.float32), 31, sigma
        ))
    )
    shifts = [jnp.asarray(np.float32(1e-6 * i)) for i in range(reps)]
    np.asarray(f_tab(shifts[0]))
    t0 = time.time()
    outs = [f_tab(s) for s in shifts]
    for o in outs:
        np.asarray(o)
    t_tab = (time.time() - t0) / reps * 1e3

    print(f"windowed parts (far+windows, 31 lines)  {t_parts:8.2f} ms/call")
    print(f"table interp (S,P) 2-take lerp          {t_interp:8.2f} ms/call")
    print(f"table build (G={G} x 31-line Faddeeva)  {t_tab:8.2f} ms/call")


if __name__ == "__main__":
    main()
