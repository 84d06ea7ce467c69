"""Survey-scale integration: spectra -> sharded batch selection ->
checkpointed shards -> merged catalog -> CDDF statistics.

Exercises the full production chain end to end on synthetic data.
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from gpy_dla_detection_tpu.analysis.catalog_tools import merge_catalogs
from gpy_dla_detection_tpu.analysis.cddf import ProcessedCatalog
from gpy_dla_detection_tpu.catalog_io import write_catalog
from gpy_dla_detection_tpu.data.samples import (
    generate_dla_samples,
    generate_subdla_samples,
)
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model,
    synthetic_prior_catalog,
    synthetic_spectrum,
)
from gpy_dla_detection_tpu.parallel.batch import make_spectra_mesh, process_batch
from gpy_dla_detection_tpu.params import Parameters

# enough z samples that an injected absorber's trough cannot fall
# between grid points; injections at logNHI >= 21 are unmissable
NUM_SAMPLES = 500
MAX_DLAS = 2
N_SPECTRA = 12


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("survey")
    params = Parameters(num_dla_samples=NUM_SAMPLES)
    learned = synthetic_learned_model(params)
    prior = synthetic_prior_catalog(params)
    dla_s = generate_dla_samples(params)
    sub_s = generate_subdla_samples(params)

    rng = np.random.default_rng(0)
    spectra, z_qsos, injected = [], [], []
    for i in range(N_SPECTRA):
        z = float(rng.uniform(2.7, 3.5))
        dla = [(z - rng.uniform(0.2, 0.5), rng.uniform(21.0, 21.5))] if i % 2 else None
        spectra.append(synthetic_spectrum(params, learned, z, seed=i, dlas=dla))
        z_qsos.append(z)
        injected.append(dla)

    mesh = make_spectra_mesh(jax.devices("cpu"))
    # process in two "host shards" like the production launcher
    shard_files = []
    for shard in range(2):
        lo, hi = shard * 6, shard * 6 + 6
        results = process_batch(
            learned,
            spectra[lo:hi],
            dla_s,
            sub_s,
            prior,
            params,
            jax.random.PRNGKey(shard),
            MAX_DLAS,
            mesh=mesh,
        )
        path = str(tmp / f"processed.shard{shard}.h5")
        write_catalog(
            path, results, params, MAX_DLAS, z_qsos[lo:hi],
            [f"spec-{i}" for i in range(lo, hi)],
        )
        shard_files.append(path)

    merged = str(tmp / "processed.h5")
    total = merge_catalogs(shard_files, merged)
    assert total == N_SPECTRA
    return dict(
        params=params,
        merged=merged,
        injected=injected,
        z_qsos=z_qsos,
        dla_s=dla_s,
    )


def test_detections_match_injections(survey):
    import h5py

    with h5py.File(survey["merged"], "r") as f:
        p_dlas = f["p_dlas"][()]
        map_z = f["MAP_z_dlas"][()]
    for i, dla in enumerate(survey["injected"]):
        if dla:
            assert p_dlas[i] > 0.9, (i, p_dlas[i])
            assert abs(map_z[i, 0, 0] - dla[0][0]) < 0.02
        else:
            assert p_dlas[i] < 0.5, (i, p_dlas[i])


def test_cddf_from_merged_catalog(survey):
    import h5py

    with h5py.File(survey["merged"], "r") as f:
        cat = ProcessedCatalog(
            min_z_dlas=f["min_z_dlas"][()],
            max_z_dlas=f["max_z_dlas"][()],
            model_posteriors=f["model_posteriors"][()],
            sample_log_likelihoods=f["sample_log_likelihoods_dla"][()],
            log_likelihoods_dla=f["log_likelihoods_dla"][()],
            base_sample_inds=np.transpose(f["base_sample_inds"][()], (0, 1, 2)),
            offset_samples=survey["dla_s"].offset_samples,
            log_nhi_samples=survey["dla_s"].log_nhi_samples,
            sub_dla=True,
            max_k=1,
        )

    n_injected = sum(
        1
        for dla in survey["injected"]
        if dla and dla[0][1] > 20.3
    )
    maxlike, l68, l95 = cat.confidence_intervals(
        q_bins=np.array([2.0, 3.6]), lred=2.0, ured=3.6, lnhi_min=20.3
    )
    # expected-count MAP within the 95% interval of the injected truth
    assert l95[0][0] - 1 <= n_injected <= l95[0][1] + 1, (maxlike, n_injected)

    z_cent, dndx, dndx68, dndx95, xerrs = cat.line_density(2.0, 3.6)
    assert np.all(np.isfinite(dndx))

    z_cent, omega, omega_err = cat.omega_dla(2.0, 3.6)
    assert np.all(np.isfinite(omega))
