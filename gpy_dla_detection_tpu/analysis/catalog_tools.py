"""Catalog post-processing utilities.

Rebuilds of the reference's shard-merge and catalog-emission tooling:

* ``merge_catalogs`` — concatenate per-shard processed files into one
  catalog, validating that model posteriors stay normalized
  (reference: CDDF_analysis/sbatch_reunion.py:13-63);
* ``generate_json_catalog`` — Parks-style JSON catalog of detections
  (reference: CDDF_analysis/qso_loader.py:1927-2095);
* ``generate_ascii_catalog`` — plain-text MAP catalog
  (reference: generate_ascii_catalog.m:48-83);
* ``roc_curve`` / ``multi_dla_confusion`` — classifier comparisons
  against a truth catalog (reference: qso_loader.py:618-718, 878-968).
"""

from __future__ import annotations

import json

import numpy as np

# per-spectrum datasets concatenated along the spectrum axis when
# merging shards (axis 0 in this framework's writer layout)
_PER_SPECTRUM = [
    "min_z_dlas",
    "max_z_dlas",
    "log_priors_no_dla",
    "log_priors_lls",
    "log_priors_dla",
    "log_likelihoods_no_dla",
    "log_likelihoods_lls",
    "log_likelihoods_dla",
    "log_posteriors_no_dla",
    "log_posteriors_lls",
    "log_posteriors_dla",
    "sample_log_likelihoods_dla",
    "sample_log_likelihoods_lls",
    "base_sample_inds",
    "MAP_z_dlas",
    "MAP_log_nhis",
    "model_posteriors",
    "p_dlas",
    "p_no_dlas",
    "z_qsos",
    "qso_list",
]


def merge_catalogs(shard_files: list[str], output_file: str) -> int:
    """Concatenate processed shard catalogs into one file.

    :return: total number of spectra merged.
    (reference: sbatch_reunion.py:13-63)
    """
    import h5py

    merged: dict[str, list] = {}
    scalars: dict[str, np.ndarray] = {}
    total = 0
    for path in shard_files:
        with h5py.File(path, "r") as f:
            n = f["p_dlas"].shape[0]
            total += n
            for name in f.keys():
                data = f[name][()]
                if name in _PER_SPECTRUM:
                    merged.setdefault(name, []).append(data)
                else:
                    scalars[name] = data

    with h5py.File(output_file, "w") as f:
        for name, data in scalars.items():
            f.create_dataset(name, data=data)
        for name, parts in merged.items():
            f.create_dataset(name, data=np.concatenate(parts, axis=0))

        # sanity: posteriors must stay normalized after the merge
        # (reference: sbatch_reunion.py:60-61)
        mp = f["model_posteriors"][()]
        sums = np.nansum(mp, axis=1)
        ok = np.isfinite(sums)
        assert np.all(np.abs(sums[ok] - 1.0) < 1e-4), "posterior normalization broken"
    return total


def generate_json_catalog(
    p_dlas,
    map_z_dlas,
    map_log_nhis,
    model_posteriors,
    z_qsos,
    ids=None,
    p_thresh: float = 0.9,
    sub_dla: int = 1,
):
    """Parks-format JSON catalog: one record per sightline with the MAP
    absorbers of the most probable multi-DLA model
    (reference: qso_loader.py:1927-2095).
    """
    p_dlas = np.asarray(p_dlas)
    map_z_dlas = np.asarray(map_z_dlas)
    map_log_nhis = np.asarray(map_log_nhis)
    mp = np.asarray(model_posteriors)
    z_qsos = np.asarray(z_qsos)
    ids = ids if ids is not None else np.arange(p_dlas.shape[0])

    catalog = []
    for i in range(p_dlas.shape[0]):
        # most probable number of DLAs = argmax posterior among DLA models
        num_dlas = int(np.argmax(mp[i])) - sub_dla
        num_dlas = max(num_dlas, 0)
        record = {
            "id": str(ids[i]),
            "z_qso": float(z_qsos[i]),
            "p_dla": float(p_dlas[i]),
            "num_dlas": num_dlas,
            "dlas": [],
        }
        if num_dlas > 0 and p_dlas[i] > p_thresh:
            for j in range(num_dlas):
                record["dlas"].append(
                    {
                        "z_dla": float(map_z_dlas[i, num_dlas - 1, j]),
                        "log_nhi": float(map_log_nhis[i, num_dlas - 1, j]),
                    }
                )
        catalog.append(record)
    return catalog


def write_json_catalog(filename: str, *args, **kw) -> None:
    with open(filename, "w") as f:
        json.dump(generate_json_catalog(*args, **kw), f, indent=1)


def generate_ascii_catalog(
    filename: str,
    p_dlas,
    map_z_dlas,
    map_log_nhis,
    z_qsos,
    ids=None,
):
    """Plain-text MAP catalog: one line per sightline
    (reference: generate_ascii_catalog.m:48-83)."""
    p_dlas = np.asarray(p_dlas)
    map_z_dlas = np.asarray(map_z_dlas)
    map_log_nhis = np.asarray(map_log_nhis)
    ids = ids if ids is not None else np.arange(p_dlas.shape[0])
    with open(filename, "w") as f:
        f.write("# id z_qso p_dla map_z_dla map_log_nhi\n")
        for i in range(p_dlas.shape[0]):
            f.write(
                f"{ids[i]} {z_qsos[i]:.6f} {p_dlas[i]:.6f} "
                f"{map_z_dlas[i, 0, 0]:.6f} {map_log_nhis[i, 0, 0]:.6f}\n"
            )


def roc_curve(p_dlas, truth):
    """ROC of the p_dla classifier against a boolean truth catalog.

    :return: (false_positive_rate, true_positive_rate, thresholds, auc)
    (reference: qso_loader.py:618-718)
    """
    p = np.asarray(p_dlas, np.float64)
    t = np.asarray(truth, bool)
    order = np.argsort(-p, kind="stable")
    p_sorted = p[order]
    t_sorted = t[order]
    tp = np.cumsum(t_sorted)
    fp = np.cumsum(~t_sorted)
    P = t.sum()
    N = (~t).sum()
    tpr = np.concatenate([[0.0], tp / max(P, 1)])
    fpr = np.concatenate([[0.0], fp / max(N, 1)])
    auc = float(np.trapezoid(tpr, fpr))
    thresholds = np.concatenate([[np.inf], p_sorted])
    return fpr, tpr, thresholds, auc


def multi_dla_confusion(map_num_dlas, true_num_dlas, max_k: int = 4):
    """Confusion matrix between predicted and true absorber counts
    (reference: qso_loader.py:878-968)."""
    pred = np.clip(np.asarray(map_num_dlas, int), 0, max_k)
    true = np.clip(np.asarray(true_num_dlas, int), 0, max_k)
    conf = np.zeros((max_k + 1, max_k + 1), dtype=np.int64)
    np.add.at(conf, (true, pred), 1)
    return conf
