"""Profile the bench workload and summarize device-op time by category.

Writes a jax.profiler trace for a few steady-state batches, then parses
the trace events into a per-op-category table (the round-2/3 roofline
methodology; PERFORMANCE.md).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"


def run():
    import jax
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.data.samples import (
        generate_dla_samples,
        generate_subdla_samples,
    )
    from gpy_dla_detection_tpu.data.spectrum import stack
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_spectrum,
    )
    from gpy_dla_detection_tpu.parallel.batch import (
        batch_evidences,
        device_put_inputs,
    )
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()
    max_dlas = 4
    batch = 32
    dtype = jnp.float32

    learned = synthetic_learned_model(params)
    spectra = [
        synthetic_spectrum(
            params, learned, 2.8 + 0.08 * i, seed=i,
            dlas=[(2.5 + 0.05 * i, 20.5)] if i % 2 else None,
        )
        for i in range(batch)
    ]
    specs0 = stack(spectra)
    dla_s = generate_dla_samples(params)
    sub_s = generate_subdla_samples(params)
    learned, dla_s, sub_s = device_put_inputs(learned, dla_s, sub_s, dtype)

    from gpy_dla_detection_tpu.data.spectrum import astype

    import numpy as np

    def batch_at(seed_shift):
        sp = stack(
            [
                synthetic_spectrum(
                    params, learned.astype(np.float64), 2.8 + 0.08 * i,
                    seed=seed_shift * 100 + i,
                )
                for i in range(batch)
            ]
        )
        return astype(sp, np.float32)

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    # warm up / compile
    out = batch_evidences(learned, batch_at(0), dla_s, sub_s, keys, params, max_dlas)
    np.asarray(out.dla.log_evidences)

    with jax.profiler.trace(TRACE_DIR):
        for i in range(1, 4):
            out = batch_evidences(
                learned, batch_at(i), dla_s, sub_s, keys, params, max_dlas
            )
        np.asarray(out.dla.log_evidences)
    print("trace written", flush=True)


def summarize():
    files = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    )
    assert files, f"no trace under {TRACE_DIR}"
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find TensorCore op events (pid/tid naming varies; take 'X' events
    # with a dur on threads whose name mentions XLA ops / TensorCore)
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        args = e.get("args", {})
        hlo_cat = args.get("hlo_category", "")
        if not hlo_cat:
            continue
        dur = e["dur"] / 1e3  # ms
        total += dur
        by_cat[hlo_cat] += dur
        key = args.get("hlo_op", name)
        by_op[(hlo_cat, key.split(".")[0])] += dur
    print(f"\ntotal device op time: {total:.1f} ms (3 batches of 32)")
    print("\nby HLO category:")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<30} {ms:9.1f} ms  {100 * ms / total:5.1f}%")
    print("\ntop 25 ops:")
    for (cat, op), ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:9.1f} ms  {100 * ms / total:5.1f}%  [{cat}] {op}")


if __name__ == "__main__":
    run()
    summarize()
