"""Systematic (low-variance) importance resampler for the chained QMC
levels (GPY_DLA_RESAMPLER=systematic, models/evidence.py).

The reference resamples multinomially (np.random.choice,
dla_gp.py:209-218); the systematic comb draws ONE uniform and places S
stratified points, so per-index counts are within 1 of S * p_i and the
drawn indices are sorted ascending — which also makes the chained
(S, N) profile-row gathers read HBM nearly sequentially.
"""

import jax
import numpy as np
import pytest

from gpy_dla_detection_tpu.data.samples import generate_dla_samples
from gpy_dla_detection_tpu.data.spectrum import preprocess
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model,
    synthetic_observation,
)
from gpy_dla_detection_tpu.models import evidence
from gpy_dla_detection_tpu.models.learned import build_spectrum_model
from gpy_dla_detection_tpu.ops.interp import chunked_searchsorted
from gpy_dla_detection_tpu.params import Parameters


def test_systematic_comb_counts_within_one():
    """The stratified comb yields per-category counts in
    {floor(S p_i), ceil(S p_i)} — the defining property of systematic
    resampling (multinomial counts are Binomial(S, p_i))."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    S = 4096
    probs = rng.gamma(0.5, size=S).astype(np.float64)
    probs /= probs.sum()
    cdf = jnp.cumsum(jnp.asarray(probs))
    u0 = 0.6180339887
    u = (jnp.arange(S, dtype=jnp.float64) + u0) * (cdf[-1] / S)
    base = np.asarray(jnp.minimum(chunked_searchsorted(cdf, u), S - 1))

    assert np.all(np.diff(base) >= 0), "systematic indices must be sorted"
    counts = np.bincount(base, minlength=S)
    # float rounding in the cumsum can shift a boundary by one slot
    np.testing.assert_array_less(np.abs(counts - S * probs), 1.0 + 1e-6)


@pytest.fixture(scope="module")
def problem():
    params = Parameters(num_dla_samples=2000)
    learned = synthetic_learned_model(params)
    samples = generate_dla_samples(params)
    wl, flux, nv, mask = synthetic_observation(
        params, learned, 3.05, seed=7, dlas=[(2.8, 20.8)]
    )
    spec = preprocess(wl, flux, nv, mask, 3.05, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)
    return params, samples, model


def _evidences(problem, resampler, seed=0):
    params, samples, model = problem
    import jax.numpy as jnp

    result = evidence.qmc_log_evidences(
        model,
        jnp.asarray(samples.offset_samples),
        jnp.asarray(samples.log_nhi_samples),
        jnp.asarray(samples.nhi_samples),
        jax.random.PRNGKey(seed),
        3,
        params,
    )
    return result


def test_systematic_evidences_match_multinomial(problem, monkeypatch):
    """Chained-level evidences under the systematic resampler agree
    with the multinomial ones within resampling noise, and the drawn
    indices are sorted (the gather-locality property)."""
    monkeypatch.setattr(evidence, "_RESAMPLER", "multinomial")
    ref = _evidences(problem, "multinomial")
    monkeypatch.setattr(evidence, "_RESAMPLER", "systematic")
    got = _evidences(problem, "systematic")

    base = np.asarray(got.base_sample_inds)
    assert base.shape[0] == 2
    for row in base:
        assert np.all(np.diff(row) >= 0)

    # level 0 shares no resampling and must be identical
    np.testing.assert_allclose(
        float(got.log_evidences[0]), float(ref.log_evidences[0]), rtol=1e-12
    )
    # chained levels: same estimator, different (valid) resampler —
    # the spread across multinomial seeds bounds the tolerance
    monkeypatch.setattr(evidence, "_RESAMPLER", "multinomial")
    spread = max(
        abs(
            float(_evidences(problem, "multinomial", seed=s).log_evidences[k])
            - float(ref.log_evidences[k])
        )
        for s in (1, 2)
        for k in (1, 2)
    )
    for k in (1, 2):
        delta = abs(float(got.log_evidences[k]) - float(ref.log_evidences[k]))
        assert delta <= max(10 * spread, 0.5), (k, delta, spread)
