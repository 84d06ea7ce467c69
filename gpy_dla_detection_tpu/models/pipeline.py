"""End-to-end per-spectrum Bayesian model selection.

Composes model construction, the null evidence, the subDLA and
multi-DLA QMC evidences (device, jitted) with the catalog priors and
posterior combination (host scalars) — the functional equivalent of the
reference driver loop (reference: run_bayes_select.py:141-245).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.catalog import PriorCatalog
from ..data.samples import DLASamples, SubDLASamples
from ..data.spectrum import Spectrum
from ..params import Parameters
from .evidence import QMCEvidenceResult, null_log_evidence, qmc_log_evidences
from .learned import LearnedModel, build_spectrum_model
from .selection import ModelSelectionResult, log_priors_k_dlas, log_priors_subdla, model_selection


class EvidenceOutputs(NamedTuple):
    """Device-side outputs of the jitted evidence computation."""

    log_evidence_null: jnp.ndarray
    dla: QMCEvidenceResult
    subdla: QMCEvidenceResult


@partial(jax.jit, static_argnames=("params", "max_dlas"))
def compute_evidences(
    learned: LearnedModel,
    spec: Spectrum,
    dla_offsets: jnp.ndarray,
    dla_log_nhi: jnp.ndarray,
    dla_nhi: jnp.ndarray,
    sub_offsets: jnp.ndarray,
    sub_log_nhi: jnp.ndarray,
    sub_nhi: jnp.ndarray,
    key: jax.Array,
    params: Parameters,
    max_dlas: int,
    base_inds_override: jnp.ndarray | None = None,
) -> EvidenceOutputs:
    """All model evidences for one spectrum (jitted, fixed shapes).

    :param base_inds_override: optional (max_dlas - 1, S) resampling
        indices replacing the categorical draws of the DLA chain (used
        to reproduce a reference run bit-for-bit in conformance tests).
    """
    model = build_spectrum_model(learned, spec, params)
    k_dla, k_sub = jax.random.split(key)
    return EvidenceOutputs(
        log_evidence_null=null_log_evidence(model),
        dla=qmc_log_evidences(
            model, dla_offsets, dla_log_nhi, dla_nhi, k_dla, max_dlas, params,
            base_inds_override=base_inds_override,
        ),
        subdla=qmc_log_evidences(
            model, sub_offsets, sub_log_nhi, sub_nhi, k_sub, 1, params
        ),
    )


class SpectrumResult(NamedTuple):
    """Everything the catalog records for one spectrum
    (reference: run_bayes_select.py:108-230)."""

    selection: ModelSelectionResult
    log_evidence_null: float
    log_evidences_dla: np.ndarray  # (max_dlas,)
    log_evidence_subdla: float
    sample_log_likelihoods_dla: np.ndarray  # (S, max_dlas)
    sample_log_likelihoods_subdla: np.ndarray  # (S,)
    base_sample_inds: np.ndarray  # (max_dlas - 1, S)
    map_z_dlas: np.ndarray  # (max_dlas, max_dlas)
    map_log_nhis: np.ndarray  # (max_dlas, max_dlas)
    min_z_dla: float
    max_z_dla: float
    p_dla: float
    p_no_dla: float


def process_spectrum(
    learned: LearnedModel,
    spec: Spectrum,
    dla_samples: DLASamples,
    subdla_samples: SubDLASamples,
    prior: PriorCatalog,
    params: Parameters,
    key: jax.Array,
    max_dlas: int = 4,
    base_inds_override: np.ndarray | None = None,
) -> SpectrumResult:
    """Full Bayesian model selection for one preprocessed spectrum."""
    out = compute_evidences(
        learned,
        spec,
        jnp.asarray(dla_samples.offset_samples),
        jnp.asarray(dla_samples.log_nhi_samples),
        jnp.asarray(dla_samples.nhi_samples),
        jnp.asarray(subdla_samples.offset_samples),
        jnp.asarray(subdla_samples.log_nhi_samples),
        jnp.asarray(subdla_samples.nhi_samples),
        key,
        params,
        max_dlas,
        base_inds_override=(
            None
            if base_inds_override is None
            else jnp.asarray(base_inds_override, jnp.int32)
        ),
    )

    num_dlas, num_quasars = prior.less_ind(float(spec.z_qso))
    lp_dla = log_priors_k_dlas(num_dlas, num_quasars, max_dlas)
    lp_sub = log_priors_subdla(
        num_dlas, num_quasars, subdla_samples.Z_lls, subdla_samples.Z_dla
    )

    sel = model_selection(
        lp_sub,
        lp_dla,
        float(out.log_evidence_null),
        np.asarray(out.subdla.log_evidences),
        np.asarray(out.dla.log_evidences),
    )

    return SpectrumResult(
        selection=sel,
        log_evidence_null=float(out.log_evidence_null),
        log_evidences_dla=np.asarray(out.dla.log_evidences),
        log_evidence_subdla=float(out.subdla.log_evidences[0]),
        sample_log_likelihoods_dla=np.asarray(out.dla.sample_log_likelihoods),
        sample_log_likelihoods_subdla=np.asarray(
            out.subdla.sample_log_likelihoods[:, 0]
        ),
        base_sample_inds=np.asarray(out.dla.base_sample_inds),
        map_z_dlas=np.asarray(out.dla.map_z_dlas),
        map_log_nhis=np.asarray(out.dla.map_log_nhis),
        min_z_dla=float(spec.min_z_dla),
        max_z_dla=float(spec.max_z_dla),
        p_dla=sel.p_dla,
        p_no_dla=sel.p_no_dla,
    )
