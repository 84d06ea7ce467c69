"""Catalog tools: merge, JSON/ASCII emitters, ROC, confusion,
comparison machinery."""

import json

import numpy as np

from gpy_dla_detection_tpu.analysis.catalog_tools import (
    generate_json_catalog,
    merge_catalogs,
    multi_dla_confusion,
    roc_curve,
)
from gpy_dla_detection_tpu.analysis.comparison import (
    TruthCatalog,
    compare_catalogs,
    match_truth,
)


def test_roc_perfect_classifier():
    p = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    t = np.array([True, True, True, False, False])
    fpr, tpr, thr, auc = roc_curve(p, t)
    assert auc == 1.0


def test_roc_tied_scores_order_invariant():
    """Tied scores get 0.5 credit (one diagonal segment per distinct
    threshold), not an input-order-dependent staircase."""
    p = np.array([0.5, 0.5])
    for t in ([True, False], [False, True]):
        _, _, _, auc = roc_curve(p, np.array(t))
        assert auc == 0.5
    # all-tied scores: AUC exactly 0.5 regardless of class balance
    _, _, _, auc = roc_curve(np.full(10, 0.3), np.arange(10) < 3)
    assert auc == 0.5


def test_roc_random_classifier():
    rng = np.random.default_rng(0)
    p = rng.uniform(size=2000)
    t = rng.uniform(size=2000) < 0.3
    _, _, _, auc = roc_curve(p, t)
    assert 0.45 < auc < 0.55


def test_confusion_diagonal():
    conf = multi_dla_confusion([0, 1, 2, 1], [0, 1, 2, 2], max_k=3)
    assert conf[0, 0] == 1 and conf[1, 1] == 1 and conf[2, 2] == 1
    assert conf[2, 1] == 1  # one true-2 predicted-1


def test_json_catalog_structure():
    p = np.array([0.95, 0.1])
    map_z = np.full((2, 2, 2), np.nan)
    map_n = np.full((2, 2, 2), np.nan)
    map_z[0, 0, 0], map_n[0, 0, 0] = 2.5, 20.8
    mp = np.array([[0.02, 0.03, 0.95, 0.0], [0.85, 0.05, 0.1, 0.0]])
    cat = generate_json_catalog(p, map_z, map_n, mp, z_qsos=[3.0, 2.5])
    assert cat[0]["num_dlas"] == 1
    assert cat[0]["dlas"][0]["z_dla"] == 2.5
    assert cat[1]["num_dlas"] == 0 and cat[1]["dlas"] == []
    json.dumps(cat)  # serializable


def test_truth_matching_and_comparison():
    truth = TruthCatalog.from_flat(
        ids=[10, 10, 30], z_dlas=[2.5, 3.0, 2.2], log_nhis=[20.8, 19.0, 21.5]
    )
    ids = [10, 20, 30]
    has, counts, z_lists, n_lists = match_truth(ids, truth)
    assert list(has) == [True, False, True]
    assert list(counts) == [1, 0, 1]  # the 19.0 absorber is sub-DLA

    p = np.array([0.99, 0.05, 0.97])
    map_z = np.full((3, 4, 4), np.nan)
    map_n = np.full((3, 4, 4), np.nan)
    map_z[0, 0, 0], map_n[0, 0, 0] = 2.51, 20.7
    map_z[2, 0, 0], map_n[2, 0, 0] = 2.21, 21.6
    mp = np.zeros((3, 6))
    mp[0, 2] = 1.0  # DLA(1)
    mp[1, 0] = 1.0  # null
    mp[2, 2] = 1.0
    res = compare_catalogs(ids, p, map_z, map_n, mp, truth)
    assert res.auc == 1.0
    assert res.confusion[1, 1] == 2 and res.confusion[0, 0] == 1
    np.testing.assert_allclose(res.delta_z, [0.01, 0.01], atol=1e-12)


def test_merge_catalogs(tmp_path):
    import h5py

    paths = []
    for shard in range(2):
        path = str(tmp_path / f"part{shard}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("p_dlas", data=np.array([0.1 + shard, 0.2 + shard]))
            f.create_dataset(
                "model_posteriors",
                data=np.tile([[0.7, 0.2, 0.1]], (2, 1)),
            )
            f.create_dataset("num_dla_samples", data=100)
        paths.append(path)
    out = str(tmp_path / "merged.h5")
    total = merge_catalogs(paths, out)
    assert total == 4
    with h5py.File(out, "r") as f:
        assert f["p_dlas"].shape == (4,)
        assert f["num_dla_samples"][()] == 100


def test_truth_loaders(tmp_path):
    from gpy_dla_detection_tpu.analysis.comparison import (
        truth_from_concordance,
        truth_from_parks_json,
    )

    # parks JSON round trip through our own emitter format
    records = [
        {"id": "42", "z_qso": 3.0, "p_dla": 0.99, "num_dlas": 2,
         "dlas": [{"z_dla": 2.5, "log_nhi": 20.8}, {"z_dla": 2.7, "log_nhi": 21.0}]},
        {"id": "43", "z_qso": 2.5, "p_dla": 0.1, "num_dlas": 0, "dlas": []},
    ]
    p = tmp_path / "parks.json"
    p.write_text(json.dumps(records))
    truth = truth_from_parks_json(str(p))
    assert list(truth.ids) == ["42"]
    assert len(truth.z_dlas[0]) == 2

    # concordance text
    c = tmp_path / "dla_catalog"
    c.write_text("100 2.3 20.5\n100 2.6 21.1\n200 3.0 20.9\n")
    truth = truth_from_concordance(str(c))
    assert list(truth.ids) == [100, 200]
    np.testing.assert_allclose(truth.log_nhis[0], [20.5, 21.1])


def test_query_least_num_dlas_matches_reference():
    """Vectorized downward-threshold DLA counting vs the reference's
    QSOLoader.query_least_num_dlas (driven unbound on a stub so no
    catalog files are needed)."""
    import types

    from gpy_dla_detection_tpu.analysis.comparison import query_least_num_dlas

    from .reference_oracle import import_reference

    import_reference()
    from CDDF_analysis.qso_loader import QSOLoader

    rng = np.random.default_rng(0)
    mp = rng.dirichlet(np.full(6, 0.2), size=40)  # [null, sub, DLA1..4]
    # make some rows decisive at various k
    mp[0] = [0.01, 0.01, 0.96, 0.01, 0.005, 0.005]
    mp[1] = [0.005, 0.005, 0.0, 0.0, 0.0, 0.99]
    mp[2] = [0.99, 0.002, 0.002, 0.002, 0.002, 0.002]

    got = query_least_num_dlas(mp, p_thresh=0.9, sub_dla=1)

    stub = types.SimpleNamespace(
        sub_dla=1, downward_model=QSOLoader.downward_model
    )
    want = [
        QSOLoader.query_least_num_dlas(stub, row.copy(), 0.9) for row in mp
    ]
    np.testing.assert_array_equal(got, np.asarray(want))
