"""Published-catalog acceptance tests (golden values), gated on data.

The reference's primary acceptance suite pins numbers from the
published Garnett/Ho catalogs against real SDSS spectra (reference:
tests/test_model.py:110-279, test_selection.py:428-452,
test_zestimation.py:53-70).  Those numbers are the portable conformance
contract (SURVEY.md section 4); this module re-runs them through this
framework whenever the `.mat` artifacts are present, and skips cleanly
otherwise (this build environment has no network egress and ships no
data).

Run with:

    GPY_DLA_DATA_DIR=/path/to/data pytest tests/test_realdata.py -m realdata -v

Expected data layout (the reference's, README.md:37-46):

    $GPY_DLA_DATA_DIR/
      dr12q/processed/catalog.mat
      dr12q/processed/learned_qso_model_lyseries_variance_kim_dr9q_minus_concordance.mat
      dr12q/processed/dla_samples_a03.mat
      dr12q/processed/subdla_samples.mat
      dr12q/processed/learned_zqso_only_model_outdata_full_dr9q_minus_concordance_norm_1176-1256.mat
      dla_catalogs/dr9q_concordance/processed/los_catalog
      dla_catalogs/dr9q_concordance/processed/dla_catalog

Spectra are downloaded on demand into $GPY_DLA_SPECTRA_DIR (default:
$GPY_DLA_DATA_DIR/spectra) via data/download.py; set
GPY_DLA_NUM_SPECTRA to control how many of the 100 Ho-2020 golden
sightlines the batch tests cover (default 10, like the reference's
default `test_p_dlas(10)`).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.realdata

DATA_DIR = os.environ.get(
    "GPY_DLA_DATA_DIR", os.path.join(os.path.dirname(__file__), "..", "data")
)
SPECTRA_DIR = os.environ.get(
    "GPY_DLA_SPECTRA_DIR", os.path.join(DATA_DIR, "spectra")
)
NUM_SPECTRA = int(os.environ.get("GPY_DLA_NUM_SPECTRA", "10"))

PROCESSED = os.path.join(DATA_DIR, "dr12q", "processed")
CATALOG_MAT = os.path.join(PROCESSED, "catalog.mat")
LEARNED_MAT = os.path.join(
    PROCESSED,
    "learned_qso_model_lyseries_variance_kim_dr9q_minus_concordance.mat",
)
DLA_SAMPLES_MAT = os.path.join(PROCESSED, "dla_samples_a03.mat")
SUBDLA_SAMPLES_MAT = os.path.join(PROCESSED, "subdla_samples.mat")
ZQSO_LEARNED_MAT = os.path.join(
    PROCESSED,
    "learned_zqso_only_model_outdata_full_dr9q_minus_concordance_norm_1176-1256.mat",
)
LOS_CATALOG = os.path.join(
    DATA_DIR, "dla_catalogs", "dr9q_concordance", "processed", "los_catalog"
)
DLA_CATALOG = os.path.join(
    DATA_DIR, "dla_catalogs", "dr9q_concordance", "processed", "dla_catalog"
)

GOLDEN_JSON = os.path.join(os.path.dirname(__file__), "data", "ho2020_golden.json")

_CORE = [CATALOG_MAT, LEARNED_MAT, DLA_SAMPLES_MAT, SUBDLA_SAMPLES_MAT,
         LOS_CATALOG, DLA_CATALOG]


def _need(paths):
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        pytest.skip(f"real-data artifacts not present: {missing[0]} (and "
                    f"{len(missing) - 1} more)" if len(missing) > 1 else
                    f"real-data artifact not present: {missing[0]}")


def _get_spectrum(plate, mjd, fiber_id):
    """Download (or reuse) one SDSS spectrum; skip if offline."""
    from gpy_dla_detection_tpu.data.download import retrieve_raw_spec

    try:
        return retrieve_raw_spec(plate, mjd, fiber_id, directory=SPECTRA_DIR)
    except RuntimeError as e:
        pytest.skip(f"cannot download spectrum (offline?): {e}")


@pytest.fixture(scope="module")
def artifacts():
    """Real learned model + prior catalog + QMC samples."""
    _need(_CORE)
    from gpy_dla_detection_tpu.data import loaders
    from gpy_dla_detection_tpu.data.catalog import PriorCatalog
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters()
    learned = loaders.load_learned_model(LEARNED_MAT)
    prior = PriorCatalog.from_mat(params, CATALOG_MAT, LOS_CATALOG, DLA_CATALOG)
    dla_samples = loaders.load_dla_samples(DLA_SAMPLES_MAT, params)
    sub_samples = loaders.load_subdla_samples(SUBDLA_SAMPLES_MAT, params)
    return params, learned, prior, dla_samples, sub_samples


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_JSON) as f:
        return json.load(f)["spectra"]


def test_null_evidence_golden(artifacts):
    """Null-model evidences of the two paper spectra
    (reference: tests/test_model.py:110-142, tolerance 1 in log)."""
    import jax

    from gpy_dla_detection_tpu.data.fits import read_spec
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.models.evidence import null_log_evidence
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model

    params, learned, *_ = artifacts
    for (plate, mjd, fiber), z_qso, want in [
        ((5309, 55929, 362), 3.166, -889.04809017),
        ((3816, 55272, 76), 3.68457627, -734.3727266),
    ]:
        path = _get_spectrum(plate, mjd, fiber)
        wl, flux, nv, pm = read_spec(path)
        spec = preprocess(wl, flux, nv, pm, z_qso, params)
        model = build_spectrum_model(learned.astype(np.float64), spec, params)
        got = float(null_log_evidence(model))
        assert abs(got - want) < 1.0, (plate, got, want)


def test_dla_evidences_golden(artifacts):
    """1-4 DLA evidences of spec-5309-55929-0362 vs the catalog
    (reference: tests/test_model.py:267-279, tolerance 2.5 in log)."""
    import jax

    from gpy_dla_detection_tpu.data.fits import read_spec
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.models.evidence import qmc_log_evidences
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model

    params, learned, prior, dla_samples, _ = artifacts
    path = _get_spectrum(5309, 55929, 362)
    wl, flux, nv, pm = read_spec(path)
    spec = preprocess(wl, flux, nv, pm, 3.166, params)
    model = build_spectrum_model(learned.astype(np.float64), spec, params)

    result = qmc_log_evidences(
        model,
        np.asarray(dla_samples.offset_samples),
        np.asarray(dla_samples.log_nhi_samples),
        np.asarray(dla_samples.nhi_samples),
        jax.random.PRNGKey(0),
        4,
        params,
    )
    want = np.array([-688.91647288, -633.00070813, -634.08569242, -640.77120558])
    got = np.asarray(result.log_evidences)
    assert np.all(np.abs(got - want) < 2.5), (got, want)


def test_log_priors_golden(artifacts):
    """Catalog model priors at z=3.166
    (reference: tests/test_model.py:320-324, tolerance 1e-4)."""
    from gpy_dla_detection_tpu.models.selection import log_priors_k_dlas

    params, _, prior, *_ = artifacts
    m, n = prior.less_ind(3.166)
    got = log_priors_k_dlas(m, n, 4)
    want = np.array([-2.53774598, -4.97413739, -7.40285925, -9.74851888])
    assert np.all(np.abs(got - want) < 1e-4), (got, want)


def test_p_dlas_and_map_golden(artifacts, golden):
    """p_dla within 5e-2 and exact MAP number of DLAs on the first N
    Ho-2020 spectra — the reference's primary acceptance test
    (reference: tests/test_selection.py:428-452, README.md:67-72)."""
    import jax

    from gpy_dla_detection_tpu.data.fits import read_spec
    from gpy_dla_detection_tpu.data.spectrum import preprocess
    from gpy_dla_detection_tpu.parallel.batch import process_batch

    params, learned, prior, dla_samples, sub_samples = artifacts
    rows = golden[:NUM_SPECTRA]
    spectra = []
    for rec in rows:
        path = _get_spectrum(rec["plate"], rec["mjd"], rec["fiber_id"])
        wl, flux, nv, pm = read_spec(path)
        spectra.append(preprocess(wl, flux, nv, pm, rec["z_qso"], params))

    results = process_batch(
        learned,
        spectra,
        dla_samples,
        sub_samples,
        prior,
        params,
        jax.random.PRNGKey(0),
        max_dlas=4,
    )
    for rec, res in zip(rows, results):
        assert abs(res.p_dla - rec["p_dla"]) < 5e-2, (rec, res.p_dla)
        # MAP num DLAs with the sub-DLA posterior folded into "no DLA"
        # (reference: test_selection.py:440-452)
        mp = np.asarray(res.selection.model_posteriors)
        combined = np.concatenate([[res.p_no_dla], mp[2:]])
        assert int(np.nanargmax(combined)) == rec["map_num_dlas"], rec


def test_zqso_accuracy_golden(golden):
    """zQSO MAP accuracy over the golden sightlines
    (reference: tests/test_zestimation.py:53-70: P(|dz| < 0.5) > 0.98
    over 100 spectra)."""
    _need([ZQSO_LEARNED_MAT])
    from gpy_dla_detection_tpu.data.fits import read_spec
    from gpy_dla_detection_tpu.data.loaders import load_z_learned_model
    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    params = ZParameters()
    learned = load_z_learned_model(ZQSO_LEARNED_MAT)

    rows = golden[:NUM_SPECTRA]
    diffs = []
    for rec in rows:
        path = _get_spectrum(rec["plate"], rec["mjd"], rec["fiber_id"])
        wl, flux, nv, pm = read_spec(path)
        spec = prepare_z_spectrum(wl, flux, nv, pm, params.num_pixels_padded)
        z_map, _, _ = inference_z_qso(learned, spec, params)
        diffs.append(z_map - rec["z_qso"])
    accuracy = np.mean(np.abs(np.asarray(diffs)) < 0.5)
    # the paper reports ~99% over the full set; require the reference's
    # 0.98 at full coverage and a looser bound on small subsets
    threshold = 0.98 if len(rows) >= 100 else 0.9
    assert accuracy >= threshold, (accuracy, diffs)
