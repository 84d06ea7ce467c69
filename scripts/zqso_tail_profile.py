"""Itemize the zQSO correlation scan's residual cost (VERDICT r4 #6).

The all-shifts FFT correlation scan left one per-z O(P) section: the
masked-median normalization + blue/redwards iid tails, evaluated as
chunked elementwise passes under ``lax.map``
(models/zqso_corr.py:316-367).  This measures, amortized over many
DIFFERENT spectra (wall clock around materialization — verify skill):

* full      — the production ``z_scan_corr``
* tail      — ONLY the chunked median+iid section (standalone jit)
* median    — the tail with the iid log-likelihoods ablated
* iid       — the tail with the median pinned to 1.0

so corr-engine cost ~= full - tail, and the median/iid split shows
which half of the tail to attack.

Usage: python scripts/zqso_tail_profile.py [--count 32] [--chunk 500]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.data.synthetic import synthetic_z_learned_model
    from gpy_dla_detection_tpu.models.zqso import (
        ZParameters,
        prepare_z_spectrum,
        sample_z_qsos,
        _masked_median_sorted,
        _sorted_flux_view,
    )
    from gpy_dla_detection_tpu.models import zqso_corr
    from gpy_dla_detection_tpu.ops.logmvn import LOG_2PI

    learned = synthetic_z_learned_model()
    params = ZParameters()
    P = 4000

    def make_spec(seed):
        rng = np.random.default_rng(seed)
        wl = 3810.0 * 10 ** (1e-4 * np.arange(P))
        fx = 1.0 + 0.05 * rng.standard_normal(P)
        nv = np.full(P, 0.01)
        pm = np.zeros(P, bool)
        return prepare_z_spectrum(wl, fx, nv, pm)

    z_grid = jnp.asarray(sample_z_qsos(params.num_zqso_samples, 2.14, 6.16))
    Z = int(z_grid.shape[0])
    chunk_size = args.chunk

    def tail_section(spec, include_iid=True, pin_median=False):
        """models/zqso_corr.py:316-367 verbatim semantics."""
        wl = spec.wavelengths
        valid = spec.valid
        wl_lo = jnp.min(jnp.where(valid, wl, jnp.inf))
        wl_hi = jnp.max(jnp.where(valid, wl, -jnp.inf))
        flux_s, wl_s, valid_s = _sorted_flux_view(spec)
        min_obs = jnp.maximum(params.min_lambda * (1.0 + z_grid), wl_lo)
        max_obs = jnp.minimum(params.max_lambda * (1.0 + z_grid), wl_hi)

        n_chunks = -(-Z // chunk_size)
        pad = n_chunks * chunk_size - Z
        zpad = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]
        )
        lo_c = zpad(min_obs).reshape(n_chunks, chunk_size)
        hi_c = zpad(max_obs).reshape(n_chunks, chunk_size)
        z_c = zpad(jnp.asarray(z_grid)).reshape(n_chunks, chunk_size)

        def one_chunk(arg):
            lo, hi, z = arg
            if pin_median:
                med = jnp.ones_like(lo)
            else:
                rest_s = wl_s[None, :] / (1.0 + z)[:, None]
                norm = (
                    (rest_s >= params.normalization_min_lambda)
                    & (rest_s <= params.normalization_max_lambda)
                    & (wl_s[None, :] > lo[:, None])
                    & (wl_s[None, :] < hi[:, None])
                    & valid_s[None, :]
                )
                med = jax.vmap(_masked_median_sorted, in_axes=(None, 0))(
                    flux_s, norm
                )
            if not include_iid:
                return med, jnp.zeros_like(med)

            def iid(ind, m, s):
                d = s * s + spec.noise_variance[None, :] / (med * med)[:, None]
                y = spec.flux[None, :] / med[:, None]
                delta = jnp.where(ind, y - m, 0.0)
                d_inv = jnp.where(ind, 1.0 / d, 0.0)
                log_d = jnp.where(ind, jnp.log(d), 0.0)
                n = jnp.sum(ind, axis=1)
                return -0.5 * (
                    jnp.sum(delta * delta * d_inv, axis=1)
                    + jnp.sum(log_d, axis=1)
                    + n * LOG_2PI
                )

            bw = (wl[None, :] < lo[:, None]) & valid[None, :]
            rw = (wl[None, :] > hi[:, None]) & valid[None, :]
            bw_ll = iid(bw, learned.bluewards_mu, learned.bluewards_sigma)
            rw_ll = iid(rw, learned.redwards_mu, learned.redwards_sigma)
            return med, bw_ll + rw_ll

        med, iid_ll = jax.lax.map(one_chunk, (lo_c, hi_c, z_c))
        return med.reshape(-1)[:Z], iid_ll.reshape(-1)[:Z]

    tail_full = jax.jit(lambda s: tail_section(s))
    tail_median = jax.jit(lambda s: tail_section(s, include_iid=False))
    tail_iid = jax.jit(lambda s: tail_section(s, pin_median=True))

    def timed(label, fn, materialize):
        # warm-up compile
        materialize(fn(make_spec(7)))
        specs = [make_spec(1000 + i) for i in range(args.count)]
        t0 = time.time()
        outs = [fn(s) for s in specs]
        for o in outs:
            materialize(o)
        dt = time.time() - t0
        print(
            f"{label:<8} {dt / args.count * 1e3:7.2f} ms/spectrum-scan",
            flush=True,
        )
        return dt / args.count

    pixel_dlog = 1e-4
    t_full = timed(
        "full",
        lambda s: zqso_corr.z_scan_corr(learned, s, params, pixel_dlog)[1],
        np.asarray,
    )
    t_tail = timed(
        "tail", tail_full, lambda o: (np.asarray(o[0]), np.asarray(o[1]))
    )
    t_med = timed(
        "median", tail_median, lambda o: (np.asarray(o[0]), np.asarray(o[1]))
    )
    t_iid = timed(
        "iid", tail_iid, lambda o: (np.asarray(o[0]), np.asarray(o[1]))
    )
    print(
        f"-> corr engine ~= {1e3 * (t_full - t_tail):.2f} ms; "
        f"tail split: median {1e3 * t_med:.2f} + iid {1e3 * t_iid:.2f} "
        f"(shared masks overlap)",
        flush=True,
    )


if __name__ == "__main__":
    main()
