"""Systematic (low-variance) importance resampler for the chained QMC
levels (GPY_DLA_RESAMPLER=systematic, models/evidence.py).

The reference resamples multinomially (np.random.choice,
dla_gp.py:209-218); the systematic comb draws ONE uniform and places S
stratified points, so per-index counts are within 1 of S * p_i, and is
then rotated by a random shift — slot i pairs parent base[i] with the
FIXED new sample i, so the raw comb's slot -> i-th-quantile coupling
would make every slot chain with itself under near-flat weights (the
pair-separation cut would invalidate all S samples).  The rotated
indices stay two ascending runs, keeping the chained (S, N)
profile-row gathers nearly sequential in HBM.
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


def _n_descents(a):
    """Number of positions where the sequence decreases: 0 for sorted,
    <= 1 for one rotation of a sorted sequence."""
    return int(np.sum(np.diff(a) < 0))


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

    assert _n_descents(base) == 0, "the raw comb must be sorted"
    counts = np.bincount(base, minlength=S)
    # float rounding in the cumsum can shift a boundary by one slot
    np.testing.assert_array_less(np.abs(counts - S * probs), 1.0 + 1e-6)


def test_systematic_draw_decouples_flat_weights():
    """Under near-flat weights the raw comb gives base[i] == i for
    every slot (each chained sample pairs with ITSELF, so the
    pair-separation cut would invalidate all S samples and NaN the
    level); the random rotation must break that coupling while keeping
    the counts and near-sortedness."""
    import jax.numpy as jnp

    S = 2048
    probs = jnp.full((S,), 1.0 / S, jnp.float64)
    for seed in range(5):
        base = np.asarray(
            evidence._draw_base_indices(
                jax.random.PRNGKey(seed), probs, "systematic"
            )
        )
        self_frac = np.mean(base == np.arange(S))
        assert self_frac < 0.01, (seed, self_frac)
        assert _n_descents(base) <= 1
        counts = np.bincount(base, minlength=S)
        np.testing.assert_array_less(np.abs(counts - 1.0), 1.0 + 1e-6)

    # multinomial stays exactly as before: unsorted, unbiased draws
    base_m = np.asarray(
        evidence._draw_base_indices(jax.random.PRNGKey(0), probs, "multinomial")
    )
    assert base_m.shape == (S,) and base_m.min() >= 0 and base_m.max() < S


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


def _evidences(problem, seed=0):
    params, samples, model = problem
    import jax.numpy as jnp

    return evidence.qmc_log_evidences(
        model,
        jnp.asarray(samples.offset_samples),
        jnp.asarray(samples.log_nhi_samples),
        jnp.asarray(samples.nhi_samples),
        jax.random.PRNGKey(seed),
        3,
        params,
    )


def test_systematic_evidences_match_multinomial(problem, monkeypatch):
    """Chained-level evidences under the systematic resampler agree
    with the multinomial ones within resampling noise, and the drawn
    indices stay two ascending runs (the gather-locality property)."""
    monkeypatch.setattr(evidence, "_RESAMPLER", "multinomial")
    ref = _evidences(problem)
    monkeypatch.setattr(evidence, "_RESAMPLER", "systematic")
    got = _evidences(problem)

    base = np.asarray(got.base_sample_inds)
    assert base.shape[0] == 2
    for row in base:
        assert _n_descents(row) <= 1

    # level 0 shares no resampling and must be identical
    np.testing.assert_allclose(
        float(got.log_evidences[0]), float(ref.log_evidences[0]), rtol=1e-12
    )
    # chained levels: same estimator, different (valid) resampler —
    # the spread across multinomial seeds bounds the tolerance
    monkeypatch.setattr(evidence, "_RESAMPLER", "multinomial")
    spread = max(
        abs(float(_evidences(problem, seed=s).log_evidences[k]) - float(ref.log_evidences[k]))
        for s in (1, 2)
        for k in (1, 2)
    )
    for k in (1, 2):
        delta = abs(float(got.log_evidences[k]) - float(ref.log_evidences[k]))
        assert delta <= max(10 * spread, 0.5), (k, delta, spread)
