"""Benchmark: full Bayesian model selection throughput on one chip.

Reference workload per spectrum (BASELINE.md): 10,000 QMC samples x
(4 DLA levels + 1 subDLA) + null evidence, rank-20 GP over ~1,250
pixels — the reference Python takes ~4 minutes per spectrum on one CPU
core (reference: run_bayes_select.py:233).

Prints one JSON line: spectra/sec on the available accelerator, with
vs_baseline = speedup over the reference's ~1/240 spectra/sec.
"""

import json
import os
import time

import numpy as np

# persistent compilation cache: repeated bench runs skip the (slow)
# remote XLA compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_SPECTRA_PER_SEC = 1.0 / 240.0


def main():
    import jax
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.data.samples import (
        generate_dla_samples,
        generate_subdla_samples,
    )
    from gpy_dla_detection_tpu.data.spectrum import astype, stack
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_spectrum,
    )
    from gpy_dla_detection_tpu.parallel.batch import (
        batch_evidences,
        device_put_inputs,
    )
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()  # full scale: 10k samples, 1280-pixel window
    max_dlas = 4
    batch = 32
    dtype = jnp.float32

    learned = synthetic_learned_model(params)
    spectra = [
        synthetic_spectrum(
            params,
            learned,
            2.8 + 0.08 * i,
            seed=i,
            dlas=[(2.5 + 0.05 * i, 20.5)] if i % 2 else None,
        )
        for i in range(batch)
    ]
    specs = stack(spectra)
    dla_s = generate_dla_samples(params)
    sub_s = generate_subdla_samples(params)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    # commit the batch-invariant inputs to the device once: re-sending
    # them per dispatch through the tunneled runtime measured ~12% of
    # end-to-end throughput
    learned, dla_s, sub_s = device_put_inputs(learned, dla_s, sub_s, dtype)
    specs = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)), astype(specs, np.float32)
    )
    keys = jax.device_put(keys)

    def run(k):
        return batch_evidences(
            learned,
            specs,
            dla_s,
            sub_s,
            k,
            params,
            max_dlas,
            mesh=None,
            dtype=None,
        )

    # warmup / compile
    out = run(keys)
    jax.block_until_ready(out.dla.log_evidences)
    assert np.isfinite(np.asarray(out.log_evidence_null)).all()

    # steady-state throughput: enqueue every pass (DIFFERENT keys per
    # pass — repeated identical dispatches make block_until_ready
    # unreliable on this platform, see PERFORMANCE.md methodology),
    # drain once; this measures the pipelined device rate the survey
    # driver sustains rather than serializing each pass on the
    # tunnel's completion-notification latency
    passes = 4
    pass_keys = [
        jax.device_put(jax.random.split(jax.random.PRNGKey(1000 + i), batch))
        for i in range(passes)
    ]
    t0 = time.perf_counter()
    outs = [run(k) for k in pass_keys]
    for o in outs:
        try:
            o.dla.log_evidences.copy_to_host_async()
        except AttributeError:
            pass
    for o in outs:
        np.asarray(o.dla.log_evidences)
    best = time.perf_counter() - t0
    spectra_per_sec = batch * passes / best
    print(
        json.dumps(
            {
                "metric": "spectra/sec (full Bayes selection: null + subDLA + 4-DLA, 10k QMC samples)",
                "value": round(spectra_per_sec, 3),
                "unit": "spectra/sec/chip",
                "vs_baseline": round(spectra_per_sec / BASELINE_SPECTRA_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
