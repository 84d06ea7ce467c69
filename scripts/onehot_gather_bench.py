"""Microbench: small-table gathers vs one-hot MXU matmuls.

The bench-workload trace (PERFORMANCE.md, round 3 cont.) shows ~1.1 ms
per spectrum spent in gathers whose OPERANDS are tiny (a 10x128 chunked
wavelength table, a 79x128 chunked CDF table, the 10k-entry z/logNHI
sample vectors) but whose outputs are (S, 128) or (S,) — XLA's TPU
gather runs at a fixed per-output-element rate regardless of operand
size, and 1-D gathers degrade further to a serialized S(1) layout.

A gather from a small table is a one-hot matmul: out = onehot(idx) @
table rides the MXU at bf16 rate.  For exact f32 values the table is
pre-split into three bf16 planes (hi = bf16(x), mid = bf16(x - hi),
lo = bf16(x - hi - mid): 3 x 8 mantissa bits cover f32's 24, so
hi + mid + lo reconstructs x to the last bit for normal values) and the
one-hot (exact in bf16) multiplies each plane with f32 accumulation.

Measures, at the bench workload's shapes (S = 320,000 = 32 spectra x
10k samples):
  1. (S, 128) chunk-row gather from (10, 128)   [wl_chunks[c0], x6/step]
  2. (S, 128) chunk-row gather from (79, 128)   [chunked_searchsorted]
  3. (S,) element gather from (10,000,)         [z_samples[base], x6]
vs their one-hot matmul replacements, plus bitwise exactness checks.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S = 320_000
REPS = 8


def split3(table):
    hi = table.astype(jnp.bfloat16)
    r1 = table - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def onehot_rows(table_planes, idx, nc):
    oh = (idx[:, None] == jnp.arange(nc, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    out = None
    for plane in table_planes:
        t = jnp.dot(oh, plane, preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _device_ms(tdir):
    import glob
    import gzip
    import json

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    tot = 0.0
    for fpath in files:
        with gzip.open(fpath) as fh:
            for e in json.load(fh)["traceEvents"]:
                if e.get("ph") == "X" and e.get("args", {}).get("hlo_category"):
                    tot += e["dur"] / 1e3
    return tot


_SEQ = [0]


def time_fn(f, args_list):
    # device op time from a profiler trace — wall clock over the tunnel
    # mixes in dispatch latency, and materializing the (S, 128) output
    # (164 MB) would dwarf the op.  A scalar sum keeps outputs tiny; its
    # reduce time is included for both variants identically.
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    np.asarray(g(*args_list[0]))  # compile
    tdir = f"/tmp/onehot_bench_{_SEQ[0]}"
    _SEQ[0] += 1
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        outs = [g(*a) for a in args_list]
        for o in outs:
            o.copy_to_host_async()
        for o in outs:
            np.asarray(o)
    return _device_ms(tdir) / len(args_list)


def main():
    rng = np.random.default_rng(0)

    for nc, label in ((10, "wl chunks (10, 128)"), (79, "cdf chunks (79, 128)")):
        table = jnp.asarray(
            np.sort(rng.uniform(3800, 9200, (nc, 128)).astype(np.float32))
        )
        planes = [jax.device_put(p) for p in split3(table)]
        idx_list = [
            jax.device_put(
                jnp.asarray(rng.integers(0, nc, S).astype(np.int32))
            )
            for _ in range(REPS)
        ]
        g = jax.jit(lambda i, t=table: jnp.take(t, i, axis=0, mode="clip"))
        m = jax.jit(
            lambda i, p0=planes[0], p1=planes[1], p2=planes[2]: onehot_rows(
                (p0, p1, p2), i, nc
            )
        )
        t_g = time_fn(g, [(i,) for i in idx_list])
        t_m = time_fn(m, [(i,) for i in idx_list])
        exact = np.array_equal(
            np.asarray(g(idx_list[0])), np.asarray(m(idx_list[0]))
        )
        print(
            f"{label:24s} gather {t_g:7.3f} ms  onehot {t_m:7.3f} ms "
            f"({t_g / t_m:4.1f}x)  bit-exact={exact}"
        )

    # 1-D element gather from a 10k vector: chunked one-hot (chunk-row
    # matmul + in-lane select)
    n = 10_000
    vec = jnp.asarray(rng.normal(2.5, 0.5, n).astype(np.float32))
    nc = -(-n // 128)
    padded = jnp.pad(vec, (0, nc * 128 - n)).reshape(nc, 128)
    planes = [jax.device_put(p) for p in split3(padded)]
    idx_list = [
        jax.device_put(jnp.asarray(rng.integers(0, n, S).astype(np.int32)))
        for _ in range(REPS)
    ]
    g = jax.jit(lambda i, v=vec: jnp.take(v, i, mode="clip"))

    def chunked_pick(i, p0=planes[0], p1=planes[1], p2=planes[2]):
        rows = onehot_rows((p0, p1, p2), i // 128, nc)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        return jnp.sum(
            jnp.where(lane == (i % 128)[:, None], rows, 0.0), axis=1
        )

    m = jax.jit(chunked_pick)
    t_g = time_fn(g, [(i,) for i in idx_list])
    t_m = time_fn(m, [(i,) for i in idx_list])
    exact = np.array_equal(np.asarray(g(idx_list[0])), np.asarray(m(idx_list[0])))
    print(
        f"{'1-D vec (10000,)':24s} gather {t_g:7.3f} ms  onehot {t_m:7.3f} ms "
        f"({t_g / t_m:4.1f}x)  bit-exact={exact}"
    )


if __name__ == "__main__":
    main()
