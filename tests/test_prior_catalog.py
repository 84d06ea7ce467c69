"""PriorCatalog.from_mat on a synthetic catalog.mat + DR9-concordance
pair, including the duplicate-thing_id (multi-DLA sightline) case the
reference's alignment silently assumes away
(reference: model_priors.py:81-82)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from gpy_dla_detection_tpu.data.catalog import PriorCatalog
from gpy_dla_detection_tpu.params import Parameters


def _write_catalog_mat(path, thing_ids, z_qsos):
    n = len(thing_ids)
    with h5py.File(path, "w") as f:
        # MATLAB v7.3 layout: row vectors (1, n)
        f.create_dataset("thing_ids", data=np.asarray(thing_ids, np.float64)[None, :])
        f.create_dataset("z_qsos", data=np.asarray(z_qsos, np.float64)[None, :])
        f.create_dataset("in_dr9", data=np.ones((1, n)))
        f.create_dataset("filter_flags", data=np.zeros((1, n)))


def test_from_mat_duplicate_thing_ids(tmp_path):
    """A sightline listed twice in the concordance (two DLAs) must not
    crash or misalign the (z_dla, logNHI) assignment of OTHER
    sightlines; the first file-order entry wins for the duplicate."""
    params = Parameters()

    thing_ids = [101, 202, 303, 404, 505]
    z_qsos = [2.5, 3.0, 3.5, 4.0, 4.5]
    cat = str(tmp_path / "catalog.mat")
    _write_catalog_mat(cat, thing_ids, z_qsos)

    # concordance in NON-sorted order, with 303 a 2-DLA sightline and
    # 999 a DLA sightline absent from the quasar catalog
    dla_rows = [
        (404, 3.2, 20.9),
        (303, 2.8, 21.3),
        (999, 2.2, 20.5),
        (303, 3.1, 20.4),
        (101, 2.3, 20.7),
    ]
    dla_file = str(tmp_path / "dla.txt")
    np.savetxt(dla_file, np.array(dla_rows, np.float64))
    los_file = str(tmp_path / "los.txt")
    np.savetxt(los_file, np.asarray(thing_ids + [999], np.float64))

    prior = PriorCatalog.from_mat(params, cat, los_file, dla_file)

    assert prior.thing_ids.tolist() == thing_ids
    assert prior.dla_ind.tolist() == [True, False, True, True, False]
    # each sightline got ITS OWN entry (file order was shuffled)
    np.testing.assert_allclose(prior.z_dlas[0], 2.3)
    np.testing.assert_allclose(prior.log_nhis[0], 20.7)
    np.testing.assert_allclose(prior.z_dlas[3], 3.2)
    np.testing.assert_allclose(prior.log_nhis[3], 20.9)
    # the duplicated sightline keeps its FIRST concordance entry
    np.testing.assert_allclose(prior.z_dlas[2], 2.8)
    np.testing.assert_allclose(prior.log_nhis[2], 21.3)
    assert np.isnan(prior.z_dlas[1]) and np.isnan(prior.z_dlas[4])

    # less_ind consistency: counts DLA sightlines below the z cut
    num_dlas, num_qsos = prior.less_ind(5.0)
    assert (num_dlas, num_qsos) == (3, 5)


def test_from_mat_filters(tmp_path):
    """in_dr9 / filter_flags / los membership subsetting and the
    below-Lyman-limit DLA drop (reference: model_priors.py:85-140)."""
    params = Parameters()
    thing_ids = [1, 2, 3, 4]
    z_qsos = [2.5, 3.0, 5.0, 3.2]
    cat = str(tmp_path / "catalog.mat")
    n = len(thing_ids)
    with h5py.File(cat, "w") as f:
        f.create_dataset("thing_ids", data=np.asarray(thing_ids, np.float64)[None, :])
        f.create_dataset("z_qsos", data=np.asarray(z_qsos, np.float64)[None, :])
        f.create_dataset("in_dr9", data=np.array([[1.0, 0.0, 1.0, 1.0]]))
        f.create_dataset("filter_flags", data=np.array([[0.0, 0.0, 0.0, 2.0]]))

    # sightline 3: z_dla low enough that Lya falls below the QSO
    # rest-frame Lyman limit -> dla_ind must be cleared
    z_dla_low = params.lyman_limit * (1.0 + 5.0) / params.lya_wavelength - 1.0 - 0.05
    dla_file = str(tmp_path / "dla.txt")
    np.savetxt(dla_file, np.array([(1, 2.3, 20.7), (3, z_dla_low, 21.0)], np.float64))
    los_file = str(tmp_path / "los.txt")
    np.savetxt(los_file, np.asarray(thing_ids, np.float64))

    prior = PriorCatalog.from_mat(params, cat, los_file, dla_file)
    # 2 dropped by in_dr9, 4 by filter_flags
    assert prior.thing_ids.tolist() == [1, 3]
    # 3's DLA was below the Lyman limit
    assert prior.dla_ind.tolist() == [True, False]
