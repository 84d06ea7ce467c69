"""Batched, mesh-sharded Bayesian model selection over many spectra.

The reference processes its ~160k-spectrum catalog as a serial Python
loop per spectrum plus SLURM job arrays across machines (reference:
run_bayes_select.py:141, slurm/submit_gp_find_lls.sh:7-13).  Here the
spectra axis is the data-parallel axis of a ``jax.sharding.Mesh``: the
per-spectrum evidence computation is vmapped over a batch whose leading
axis is sharded across devices, the learned model and QMC samples are
replicated, and the only communication is the implicit gather of
per-spectrum scalar results — riding ICI within a slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.catalog import PriorCatalog
from ..data.samples import DLASamples, SubDLASamples
from ..data.spectrum import Spectrum, stack
from ..models.evidence import null_log_evidence, qmc_log_evidences
from ..models.learned import LearnedModel, build_spectrum_model
from ..models.pipeline import EvidenceOutputs, SpectrumResult
from ..models.selection import (
    log_priors_k_dlas,
    log_priors_subdla,
    model_selection,
)
from ..params import Parameters


def make_spectra_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices; axis name 'spectra'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("spectra",))


@partial(jax.jit, static_argnames=("params", "max_dlas"))
def _batched_evidences(
    learned: LearnedModel,
    specs: Spectrum,
    dla_offsets,
    dla_log_nhi,
    dla_nhi,
    sub_offsets,
    sub_log_nhi,
    sub_nhi,
    keys,
    params: Parameters,
    max_dlas: int,
) -> EvidenceOutputs:
    def one(spec, key):
        model = build_spectrum_model(learned, spec, params)
        k_dla, k_sub = jax.random.split(key)
        return EvidenceOutputs(
            log_evidence_null=null_log_evidence(model),
            dla=qmc_log_evidences(
                model, dla_offsets, dla_log_nhi, dla_nhi, k_dla, max_dlas, params
            ),
            subdla=qmc_log_evidences(
                model, sub_offsets, sub_log_nhi, sub_nhi, k_sub, 1, params
            ),
        )

    return jax.vmap(one)(specs, keys)


def _shard_batch(specs: Spectrum, keys, mesh: Mesh):
    """Place the batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P("spectra"))
    specs = jax.tree.map(lambda x: jax.device_put(x, sharding), specs)
    keys = jax.device_put(keys, sharding)
    return specs, keys


def batch_evidences(
    learned: LearnedModel,
    specs: Spectrum,
    dla_samples: DLASamples,
    subdla_samples: SubDLASamples,
    keys,
    params: Parameters,
    max_dlas: int = 4,
    mesh: Mesh | None = None,
    dtype=None,
) -> EvidenceOutputs:
    """Evidences for a batch of spectra (leading axis), optionally
    sharded over a device mesh."""
    if dtype is not None:
        from ..data.spectrum import astype

        specs = astype(specs, dtype)
        learned = learned.astype(dtype)

    multi_device = mesh is not None and mesh.devices.size > 1
    if mesh is not None:
        specs, keys = _shard_batch(specs, keys, mesh)

    cast = (lambda x: jnp.asarray(x, dtype)) if dtype is not None else jnp.asarray

    import os

    # the fused Pallas kernel is validated single-chip; under GSPMD
    # partitioning fall back to the XLA composition (TODO round 2:
    # shard_map + per-shard pallas_call)
    prev = os.environ.get("GPY_DLA_USE_PALLAS")
    if multi_device:
        os.environ["GPY_DLA_USE_PALLAS"] = "0"
    try:
        return _batched_evidences(
            learned,
            specs,
            cast(dla_samples.offset_samples),
            cast(dla_samples.log_nhi_samples),
            cast(dla_samples.nhi_samples),
            cast(subdla_samples.offset_samples),
            cast(subdla_samples.log_nhi_samples),
            cast(subdla_samples.nhi_samples),
            keys,
            params,
            max_dlas,
        )
    finally:
        if multi_device:
            if prev is None:
                os.environ.pop("GPY_DLA_USE_PALLAS", None)
            else:
                os.environ["GPY_DLA_USE_PALLAS"] = prev


def process_batch(
    learned: LearnedModel,
    spectra: list[Spectrum],
    dla_samples: DLASamples,
    subdla_samples: SubDLASamples,
    prior: PriorCatalog,
    params: Parameters,
    key,
    max_dlas: int = 4,
    mesh: Mesh | None = None,
    dtype=None,
) -> list[SpectrumResult]:
    """Full model selection for a list of spectra; pads the batch to a
    multiple of the mesh size, drops the padding on output."""
    B = len(spectra)
    n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    n_pad = (-B) % n_dev
    padded = spectra + [spectra[-1]] * n_pad

    specs = stack(padded)
    keys = jax.random.split(key, len(padded))
    out = batch_evidences(
        learned,
        specs,
        dla_samples,
        subdla_samples,
        keys,
        params,
        max_dlas,
        mesh,
        dtype=dtype,
    )

    null_ev = np.asarray(out.log_evidence_null)
    dla_ev = np.asarray(out.dla.log_evidences)
    sub_ev = np.asarray(out.subdla.log_evidences)
    results = []
    for i in range(B):
        num_dlas, num_quasars = prior.less_ind(float(spectra[i].z_qso))
        lp_dla = log_priors_k_dlas(num_dlas, num_quasars, max_dlas)
        lp_sub = log_priors_subdla(
            num_dlas, num_quasars, subdla_samples.Z_lls, subdla_samples.Z_dla
        )
        sel = model_selection(
            lp_sub, lp_dla, null_ev[i], sub_ev[i], dla_ev[i]
        )
        results.append(
            SpectrumResult(
                selection=sel,
                log_evidence_null=float(null_ev[i]),
                log_evidences_dla=dla_ev[i],
                log_evidence_subdla=float(sub_ev[i][0]),
                sample_log_likelihoods_dla=np.asarray(
                    out.dla.sample_log_likelihoods[i]
                ),
                sample_log_likelihoods_subdla=np.asarray(
                    out.subdla.sample_log_likelihoods[i, :, 0]
                ),
                base_sample_inds=np.asarray(out.dla.base_sample_inds[i]),
                map_z_dlas=np.asarray(out.dla.map_z_dlas[i]),
                map_log_nhis=np.asarray(out.dla.map_log_nhis[i]),
                min_z_dla=float(spectra[i].min_z_dla),
                max_z_dla=float(spectra[i].max_z_dla),
                p_dla=sel.p_dla,
                p_no_dla=sel.p_no_dla,
            )
        )
    return results
