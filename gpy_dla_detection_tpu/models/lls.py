"""Strong-Lya-absorber (LLS) search.

Rebuild of the reference's self-contained LLS finder
(reference: examples/gp_find_lls.py:52-1075): the same GP + QMC
machinery as the DLA pipeline but with

* the Lyman-limit-break absorption profile (ops/voigt.py
  ``voigt_absorption_lls``),
* a wider column-density prior logNHI in [17.2, 23] sampled uniformly
  (reference: gp_find_lls.py:227-351 wraps externally generated
  samples; uniform is the shipped configuration),
* optionally the BOSS mean-flux parameters tau_0 = 0.00554,
  beta = 3.182 (reference: gp_find_lls.py:404-417).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

from ..data.samples import halton_sequence
from ..data.spectrum import Spectrum
from ..params import Parameters
from .evidence import null_log_evidence, qmc_log_evidences
from .learned import LearnedModel, build_spectrum_model

# BOSS DR12 mean-flux measurement used by the LLS search
# (reference: gp_find_lls.py:404-417, 957-966)
BOSS_TAU_0 = 0.00554
BOSS_BETA = 3.182


class LyaSamples(NamedTuple):
    """QMC samples for strong Lya absorbers: uniform z offsets and
    uniform logNHI in [min, max]."""

    offset_samples: np.ndarray
    log_nhi_samples: np.ndarray
    nhi_samples: np.ndarray


def generate_lya_samples(
    num_samples: int = 10000,
    min_log_nhi: float = 17.2,
    max_log_nhi: float = 23.0,
) -> LyaSamples:
    seq = halton_sequence(num_samples, 2)
    log_nhi = min_log_nhi + (max_log_nhi - min_log_nhi) * seq[:, 1]
    return LyaSamples(
        offset_samples=seq[:, 0],
        log_nhi_samples=log_nhi,
        nhi_samples=10.0**log_nhi,
    )


def with_boss_meanflux(learned: LearnedModel) -> LearnedModel:
    """Swap the Kim mean-flux parameters for the BOSS measurement."""
    return learned._replace(
        prev_tau_0=np.float64(BOSS_TAU_0), prev_beta=np.float64(BOSS_BETA)
    )


def lls_log_evidences(
    learned: LearnedModel,
    spec: Spectrum,
    samples: LyaSamples,
    key: jax.Array,
    max_lya: int,
    params: Parameters,
):
    """(null evidence, QMC result for 1..max_lya absorbers) for one
    spectrum, using the LLS-break profile
    (reference: gp_find_lls.py:825-1075)."""
    import jax.numpy as jnp

    model = build_spectrum_model(learned, spec, params)
    result = qmc_log_evidences(
        model,
        jnp.asarray(samples.offset_samples),
        jnp.asarray(samples.log_nhi_samples),
        jnp.asarray(samples.nhi_samples),
        key,
        max_lya,
        params,
        profile="lls",
    )
    return null_log_evidence(model), result


def lls_model_posteriors(
    log_evidence_null: float,
    log_evidences_lls: np.ndarray,
    p_lls: float = 0.5,
):
    """Posterior over {no absorber, 1..k absorbers} with a flat split of
    the absorber prior mass over k (the LLS search uses an uninformative
    prior; reference: gp_find_lls.py discussion around :1000-1040)."""
    k = np.size(log_evidences_lls)
    log_priors = np.log(
        np.concatenate([[1.0 - p_lls], np.full(k, p_lls / k)])
    )
    log_post = (
        np.concatenate([[log_evidence_null], np.ravel(log_evidences_lls)])
        + log_priors
    )
    m = np.nanmax(log_post)
    with np.errstate(invalid="ignore"):
        post = np.exp(log_post - m)
    post = np.nan_to_num(post)
    post /= post.sum()
    return post
