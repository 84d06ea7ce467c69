"""Round-2 analysis-layer additions: CDDF bootstrap errors, external
(Parks/Noterdaeme) estimators, sub-DLA candidate catalog, MATLAB v7.3
export, and the zwarning/occam merged-catalog patch."""

import numpy as np
import pytest

from gpy_dla_detection_tpu.analysis import external
from gpy_dla_detection_tpu.analysis.catalog_tools import (
    generate_sub_dla_catalog,
    occam_model_posteriors,
    save2mat73,
    write_mat73,
    zwarning_occam_patch,
)

from .test_cddf import _toy_catalog


# ---------------------------------------------------------------------------
# bootstrap resampling (reference: calc_cddf.py:286-378)
# ---------------------------------------------------------------------------
def test_resample_restores_and_preserves_shape():
    cat, *_ = _toy_catalog(num_spec=40, S=200, seed=1)
    base = cat.line_density(2.0, 3.5)[1]

    cat.resample(True, rng=0)
    assert cat._resample is not None
    assert cat._resample.size == 40
    assert cat._resample.min() >= 0 and cat._resample.max() < 40
    resampled = cat.line_density(2.0, 3.5)[1]
    assert resampled.shape == base.shape

    cat.resample(False)
    restored = cat.line_density(2.0, 3.5)[1]
    np.testing.assert_allclose(restored, base)


def test_resample_preserves_z_distribution():
    """Stratification keeps the z_max quantiles roughly intact."""
    cat, *_ = _toy_catalog(num_spec=60, S=100, seed=3)
    cat._z_max = np.linspace(2.5, 5.5, 60)  # spread out the z range
    cat.resample(True, rng=1)
    z_re = cat._z_max[cat._resample]
    # each third of the z range keeps roughly a third of the sample
    for lo, hi in [(2.5, 3.5), (3.5, 4.5), (4.5, 5.6)]:
        frac = np.mean((z_re >= lo) & (z_re < hi))
        assert 0.15 < frac < 0.55, (lo, hi, frac)
    cat.resample(False)


def test_get_sample_errors_brackets_estimate():
    cat, *_ = _toy_catalog(num_spec=40, S=200, seed=4)
    errs = cat.get_sample_errors(z_min=2.0, z_max=3.5, nsample=6, rng=0)
    _, dNdX, _, _, _ = cat.line_density(2.0, 3.5)
    assert errs["dndx_sample"].shape == dNdX.shape
    # 95% band contains the 68% band
    assert np.all(errs["dndx_95"][0] >= errs["dndx_68"][0] - 1e-12)
    assert np.all(errs["dndx_95"][1] <= errs["dndx_68"][1] + 1e-12)
    # the bootstrap median is the right order of magnitude
    assert np.all(errs["dndx_sample"] <= 5 * dNdX + 0.1)
    # resampling state restored
    assert cat._resample is None


# ---------------------------------------------------------------------------
# external estimators (reference: qso_loader.py:1055-1551)
# ---------------------------------------------------------------------------
def _toy_parks(num_los=50, z_qso=3.0):
    """Parks-style dict: every sightline at z_qso; 10 absorbers at known
    parameters with high confidence, 5 at low confidence."""
    ids, zq, conf, zd, ln = [], [], [], [], []
    for i in range(num_los):
        ids.append(i)
        zq.append(z_qso)
        if i < 10:
            conf.append(0.999)
            zd.append(2.5)
            ln.append(20.8)
        elif i < 15:
            conf.append(0.5)  # below p_thresh
            zd.append(2.5)
            ln.append(20.8)
        else:
            conf.append(0.0)
            zd.append(np.nan)
            ln.append(np.nan)
    return {
        "ids": np.asarray(ids),
        "z_qso": np.asarray(zq, float),
        "dla_confidences": np.asarray(conf, float),
        "z_dlas": np.asarray(zd, float),
        "log_nhis": np.asarray(ln, float),
    }


def test_parks_cddf_analytic():
    parks = _toy_parks()
    our_ids = np.arange(50)
    est = external.parks_estimations(parks, our_ids, p_thresh=0.98)
    assert est.ids.size == 10  # only the high-confidence absorbers
    assert est.min_z_dlas.size == 50  # every overlapping sightline

    l_cent, cddf, xerrs = external.column_density_function_external(
        est, z_min=2.0, z_max=3.0, lnhi_nbins=6, lnhi_min=20.0, lnhi_max=23.0
    )
    # all 10 absorbers land in one bin: cddf = 10 / dX / dN there
    dX = external.path_length_flat(est.min_z_dlas, est.max_z_dlas, 2.0, 3.0)
    bin_idx = np.searchsorted(np.linspace(20.0, 23.0, 7), 20.8) - 1
    edges = np.linspace(20.0, 23.0, 7)
    dN = 10.0 ** edges[bin_idx + 1] - 10.0 ** edges[bin_idx]
    np.testing.assert_allclose(cddf[bin_idx], 10.0 / dX / dN, rtol=1e-12)
    assert np.sum(cddf > 0) == 1


def test_parks_line_density_analytic():
    parks = _toy_parks()
    est = external.parks_estimations(parks, np.arange(50), p_thresh=0.98)
    z_cent, dNdX, xerrs = external.line_density_external(
        est, z_min=2.0, z_max=3.0, bins_per_z=2
    )
    # absorbers at z=2.5 fall in the [2.5, 3.0) bin (histogram is
    # left-inclusive); each bin's dNdX = count / dX(bin)
    hit = np.argmin(np.abs(z_cent - 2.75))
    dX = external.path_length_flat(est.min_z_dlas, est.max_z_dlas, 2.5, 3.0)
    np.testing.assert_allclose(dNdX[hit], 10.0 / dX, rtol=1e-12)


def test_parks_snr_cut():
    parks = _toy_parks()
    snrs = np.where(np.arange(50) < 5, -5.0, 10.0)  # first 5 sightlines bad
    est = external.parks_estimations(parks, np.arange(50), our_snrs=snrs)
    _, cddf_all, _ = external.column_density_function_external(
        est, z_min=2.0, z_max=3.0, snr_thresh=-10.0
    )
    _, cddf_cut, _ = external.column_density_function_external(
        est, z_min=2.0, z_max=3.0, snr_thresh=0.0
    )
    # cutting 5 of the 10 DLA sightlines halves the counts but also
    # shrinks the path -> cddf_cut = 5 / dX_45 / dN
    assert cddf_cut[cddf_cut > 0][0] < cddf_all[cddf_all > 0][0]


def test_noterdaeme_estimations_analytic():
    our_ids = np.arange(100, 160)
    our_z = np.full(60, 3.2)
    los_ids = np.arange(100, 160)
    rows = np.array([[110, 2.7, 20.5], [115, 2.9, 21.0], [999, 2.8, 21.5]])
    est = external.noterdaeme_estimations(rows, los_ids, our_ids, our_z)
    assert est.ids.size == 2  # id 999 not in our catalog
    # search window EXACTLY as the reference computes it
    # (qso_loader.py:1526-1527): the km/s offsets are added to the
    # wavelengths in Angstroms — a numeric no-op — so the effective
    # window is [(1+z) lyb/lya - 1, z]
    kms3000 = 3000e5 / 2.99792458e10
    kms5000 = 5000e5 / 2.99792458e10
    want_min = (1 + 3.2) * (external.LYB_A + kms3000) / external.LYA_A - 1
    want_max = (1 + 3.2) * (external.LYA_A - kms5000) / external.LYA_A - 1
    np.testing.assert_allclose(est.min_z_dlas, want_min, rtol=1e-12)
    np.testing.assert_allclose(est.max_z_dlas, want_max, rtol=1e-12)
    np.testing.assert_allclose(want_min, (1 + 3.2) * external.LYB_A / external.LYA_A - 1, rtol=1e-4)
    np.testing.assert_allclose(want_max, 3.2, rtol=1e-4)
    z_cent, dNdX, _ = external.line_density_external(
        est, z_min=2.5, z_max=3.1, bins_per_z=1
    )
    dX = external.path_length_flat(est.min_z_dlas, est.max_z_dlas, 2.5, 3.1)
    np.testing.assert_allclose(dNdX[0], 2.0 / dX, rtol=1e-12)


def test_parks_json_roundtrip(tmp_path):
    """Our own generate_json_catalog output loads through load_parks_json."""
    import json

    from gpy_dla_detection_tpu.analysis.catalog_tools import generate_json_catalog

    mp = np.array([[0.05, 0.05, 0.9, 0.0], [0.9, 0.05, 0.05, 0.0]])
    records = generate_json_catalog(
        p_dlas=np.array([0.95, 0.02]),
        map_z_dlas=np.full((2, 2, 2), 2.5),
        map_log_nhis=np.full((2, 2, 2), 20.7),
        model_posteriors=mp,
        z_qsos=np.array([3.0, 3.1]),
    )
    path = tmp_path / "parks.json"
    with open(path, "w") as f:
        json.dump(records, f)
    d = external.load_parks_json(str(path))
    assert d["ids"].size == 2  # 1 DLA + 1 empty sightline
    assert np.sum(d["dla_confidences"] > 0.9) == 1


# ---------------------------------------------------------------------------
# sub-DLA candidates (reference: qso_loader.py:2035-2094)
# ---------------------------------------------------------------------------
def test_sub_dla_catalog():
    mp = np.array(
        [
            [0.2, 0.7, 0.1, 0.0],  # sub-DLA wins
            [0.8, 0.1, 0.1, 0.0],  # null wins
            [0.1, 0.2, 0.7, 0.0],  # DLA wins
            [0.3, 0.4, 0.2, 0.1],  # sub-DLA wins
        ]
    )
    recs = generate_sub_dla_catalog(
        mp, z_qsos=[3.0, 3.1, 3.2, 3.3], ids=[10, 11, 12, 13], snrs=[5, 6, 7, 8]
    )
    assert [r["id"] for r in recs] == ["10", "13"]
    assert recs[0]["p_sub_dla"] == pytest.approx(0.7)
    assert recs[1]["snr"] == 8.0


# ---------------------------------------------------------------------------
# MATLAB v7.3 export (reference: sbatch_reunion.py:65-86)
# ---------------------------------------------------------------------------
def test_write_mat73_header_and_layout(tmp_path):
    import h5py

    path = str(tmp_path / "out.mat")
    write_mat73(
        path,
        {
            "a": np.arange(6, dtype=np.float64).reshape(2, 3),
            "flag": np.array([True, False]),
            "scalar": np.float64(3.5),
            "names": np.array(["spec-a", "longer-name"]),
        },
    )
    # MATLAB signature in the userblock
    with open(path, "rb") as f:
        header = f.read(128)
    assert header.startswith(b"MATLAB 7.3 MAT-file")
    assert header[124:126] == bytes([0x00, 0x02])
    assert header[126:128] == b"IM"

    with h5py.File(path, "r") as f:
        # stored transposed (MATLAB column-major)
        assert f["a"].shape == (3, 2)
        np.testing.assert_allclose(f["a"][()].T, np.arange(6).reshape(2, 3))
        assert f["a"].attrs["MATLAB_class"] == b"double"
        assert f["flag"].attrs["MATLAB_class"] == b"logical"
        assert f["scalar"].shape == (1, 1)
        # strings: a MATLAB char matrix (uint16 code units, int_decode
        # 2) — a uint8 export would load as an unusable numeric matrix
        assert f["names"].attrs["MATLAB_class"] == b"char"
        assert f["names"].attrs["MATLAB_int_decode"] == 2
        rows = f["names"][()].T  # (2, width) uint16
        assert rows.dtype == np.uint16
        decoded = ["".join(map(chr, r)).rstrip() for r in rows]
        assert decoded == ["spec-a", "longer-name"]


def test_save2mat73_small_file(tmp_path):
    import h5py

    src = str(tmp_path / "processed.h5")
    with h5py.File(src, "w") as f:
        f.create_dataset("p_dlas", data=np.array([0.1, 0.9]))
        f.create_dataset("sample_log_likelihoods_dla", data=np.zeros((2, 10, 1)))
    out = str(tmp_path / "processed.mat")
    save2mat73(src, out, small_file=True)
    with h5py.File(out, "r") as f:
        assert "p_dlas" in f
        assert "sample_log_likelihoods_dla" not in f


# ---------------------------------------------------------------------------
# zwarning/occam patch (reference: sbatch_reunion.py:87-181)
# ---------------------------------------------------------------------------
def _consistent_catalog_file(path, Q=6, max_dlas=2):
    """A small processed file whose posteriors are softmax-consistent."""
    import h5py

    rng = np.random.default_rng(0)
    lp = rng.normal(size=(Q, 2 + max_dlas)) * 3
    mp = np.exp(lp - lp.max(axis=1, keepdims=True))
    mp /= mp.sum(axis=1, keepdims=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("log_posteriors_no_dla", data=lp[:, 0])
        f.create_dataset("log_posteriors_lls", data=lp[:, 1])
        f.create_dataset("log_posteriors_dla", data=lp[:, 2:])
        f.create_dataset("log_likelihoods_dla", data=lp[:, 2:] - 1.0)
        f.create_dataset("log_likelihoods_lls", data=lp[:, 1] - 1.0)
        f.create_dataset("model_posteriors", data=mp)
        f.create_dataset("p_dlas", data=mp[:, 2:].sum(axis=1))
        f.create_dataset("p_no_dlas", data=mp[:, 0])
        f.create_dataset("num_dla_samples", data=100)
    return mp


def test_zwarning_occam_patch(tmp_path):
    import h5py

    src = str(tmp_path / "merged.h5")
    mp = _consistent_catalog_file(src)
    flags = np.array([0, 0, 1, 0, 2, 0])  # drop rows 2 and 4
    out = str(tmp_path / "patched.h5")
    kept = zwarning_occam_patch(src, flags, out, occams_razor=10000.0)
    assert kept == 4

    with h5py.File(out, "r") as f:
        mp_out = f["model_posteriors"][()]
        assert mp_out.shape == (4, 4)
        np.testing.assert_allclose(mp_out.sum(axis=1), 1.0, rtol=1e-10)
        # occam: same as renormalizing with absorber models / 10000
        want = occam_model_posteriors(mp[flags == 0], 10000.0)
        np.testing.assert_allclose(mp_out, want, rtol=1e-10)
        # p_* recomputed from the rescaled posteriors
        np.testing.assert_allclose(
            f["p_dlas"][()], mp_out[:, 2:].sum(axis=1), rtol=1e-8
        )
        # the log posteriors were shifted by -log(occams): softmax of
        # [no_dla, lls, dla...] must reproduce model_posteriors
        # (the reference asserts exactly this, sbatch_reunion.py:160-170)
        lp = np.column_stack(
            [
                f["log_posteriors_no_dla"][()],
                f["log_posteriors_lls"][()],
                f["log_posteriors_dla"][()],
            ]
        )
        soft = np.exp(lp - lp.max(axis=1, keepdims=True))
        soft /= soft.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(soft, mp_out, rtol=1e-8)

    # mat73 output variant
    out_mat = str(tmp_path / "patched.mat")
    zwarning_occam_patch(src, flags, out_mat, occams_razor=10000.0, mat73=True)
    with open(out_mat, "rb") as f:
        assert f.read(19) == b"MATLAB 7.3 MAT-file"


def test_multi_roc_perfect_and_random():
    """multi_roc: tiered sub-sightline ROC (reference:
    qso_loader.py:618-661 make_multi_ROC)."""
    from gpy_dla_detection_tpu.analysis.paper_plots_multi import multi_roc

    # perfect: posteriors concentrated on the true k
    counts = np.array([0, 1, 2, 0, 1])
    mp = np.zeros((5, 6))  # [null, sub, k=1..4]
    for i, c in enumerate(counts):
        mp[i, 0 if c == 0 else c + 1] = 1.0
    fpr, tpr, auc = multi_roc(mp, counts, sub_dla=1, max_k=4)
    assert auc > 0.99, auc

    # anti-perfect: high odds exactly where the truth has nothing
    mp2 = np.zeros((5, 6))
    for i, c in enumerate(counts):
        mp2[i, 2 if c == 0 else 0] = 1.0
    _, _, auc2 = multi_roc(mp2, counts, sub_dla=1, max_k=4)
    assert auc2 < 0.5, auc2


def test_multi_dla_paper_drivers_render(tmp_path):
    """Every make_multi_dla_plots.py-style driver renders
    (reference: make_multi_dla_plots.py:87-583)."""
    from gpy_dla_detection_tpu.analysis import paper_plots_multi as pm
    from gpy_dla_detection_tpu.analysis.comparison import ComparisonResult

    sub = str(tmp_path / "multi")
    res = ComparisonResult(
        fpr=np.linspace(0, 1, 10),
        tpr=np.sqrt(np.linspace(0, 1, 10)),
        auc=0.8,
        confusion=np.array([[5, 1, 0], [1, 4, 1], [0, 1, 2]]),
        delta_z=np.random.default_rng(0).normal(0, 0.003, 40),
        delta_log_nhi=np.random.default_rng(1).normal(0, 0.2, 40),
    )
    pm.do_MAP_comparison(res, sub, label="concordance")
    pm.do_ROC_comparisons({"GP": res, "alt": res}, sub)
    pm.do_confusion(res, sub, label="parks")

    counts = np.array([0, 1, 2, 0, 1])
    mp = np.zeros((5, 6))
    for i, c in enumerate(counts):
        mp[i, 0 if c == 0 else c + 1] = 1.0
    pm.do_multi_ROC(mp, counts, sub)

    cat, *_ = _toy_catalog(num_spec=30, S=200)
    cat.bins_per_z = 2
    parks = _toy_parks()
    est = external.parks_estimations(parks, np.arange(50), p_thresh=0.98)
    pm.do_external_CDDF(cat, est, sub, label="parks")
    pm.do_external_dNdX(cat, est, sub, label="parks")
    pm.do_external_snr_check(est, sub, label="parks")

    import os
    made = set(os.listdir(sub))
    for stem in [
        "MAP_z_delta_concordance", "MAP_lognhi_delta_concordance", "roc",
        "confusion_parks", "multi_roc_parks", "cddf_gp_parks",
        "dndx_gp_parks", "cddf_parks_snr", "dndx_parks_snr",
    ]:
        assert f"{stem}.pdf" in made, stem


def test_procedure_and_this_mu_drivers(tmp_path):
    from gpy_dla_detection_tpu.analysis import paper_plots_multi as pm
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_spectrum,
    )
    from gpy_dla_detection_tpu.models.learned import build_spectrum_model
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters(num_dla_samples=16)
    learned = synthetic_learned_model(params)
    pm.do_procedure_plots(learned, learned, str(tmp_path))

    spec = synthetic_spectrum(params, learned, 3.0, seed=0, dlas=[(2.7, 21.0)])
    model = build_spectrum_model(learned, spec, params)
    pm.do_this_mu_examples(
        [model], params,
        map_z_dlas=[np.array([2.7])], map_log_nhis=[np.array([21.0])],
        subdir=str(tmp_path),
        truth_dlas=[{"concordance": [(2.7, 21.0)]}],
    )
    import os
    made = set(os.listdir(tmp_path))
    assert {"mu_omega_changes.pdf", "covariance_matrix.pdf", "this_mu_0.pdf"} <= made


def test_latex_table_loaders(tmp_path):
    """load_table / load_cddf_table consume the txt files the paper-plot
    drivers write (reference: make_tables.py:29-119)."""
    from gpy_dla_detection_tpu.analysis import paper_plots as pp
    from gpy_dla_detection_tpu.analysis.tables import (
        all_tables,
        format_latex_num,
        load_cddf_table,
        load_table,
    )

    assert format_latex_num(0.0) == "$0$"
    assert "10^" in format_latex_num(3.1e4)
    assert "10^" not in format_latex_num(0.5)

    cat, *_ = _toy_catalog(num_spec=30, S=200)
    cat.bins_per_z = 2
    sub = str(tmp_path / "tables")
    pp.do_data_plots(cat, sub)

    import os
    tex = load_table(
        os.path.join(sub, "dndx_all.txt"),
        colheaders=("$z$", "dN/dX"), caption="dndx",
    )
    assert tex.count("\\\\") > 3 and "\\begin{table*}" in tex
    tex = load_cddf_table(os.path.join(sub, "cddf_all.txt"), caption="CDDF")
    assert "\\begin{table*}" in tex
    combined = all_tables(sub)
    assert combined.count("\\begin{table*}") >= 3


def test_map_from_samples_matches_injected_peak():
    """map_from_samples re-derives the MAP from sample likelihoods
    (reference: qso_loader.py:303-408 prepare_roman_map_vals)."""
    cat, detected, picked, offsets, lnhi = _toy_catalog(num_spec=25, S=300)
    map_z, map_n = cat.map_from_samples(chunk=7)
    z_expect = 2.0 + 1.5 * offsets[picked]
    for i in range(25):
        if detected[i]:
            np.testing.assert_allclose(map_z[i], z_expect[i], rtol=1e-12)
            np.testing.assert_allclose(map_n[i], lnhi[picked[i]], rtol=1e-12)


def test_meanflux_and_lyseries_drivers(tmp_path):
    from gpy_dla_detection_tpu.analysis import paper_plots_multi as pm
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_observation,
    )
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters(num_dla_samples=16)
    learned = synthetic_learned_model(params)
    wl, fx, nv, pm_mask = synthetic_observation(params, learned, 3.2, seed=5)

    pm.do_meanflux_samples(learned, wl, fx, 3.2, str(tmp_path), tag="5")
    mu31, mu1 = pm.do_lyman_series_suppression(
        learned, wl, fx, 3.2, str(tmp_path), tag="5"
    )
    # the full Lyman series suppresses at least as much as Lya alone,
    # strictly more below the Lyb rest wavelength
    assert np.all(mu31 <= mu1 + 1e-12)
    rest = np.asarray(learned.rest_wavelengths)
    below_lyb = rest < 1025.0
    if below_lyb.any():
        assert np.any(mu31[below_lyb] < mu1[below_lyb] - 1e-9)

    import os
    made = set(os.listdir(tmp_path))
    assert {"meanflux_5.pdf", "test_num_lines_5.pdf"} <= made


def test_lya_demo_and_skyline_check(tmp_path):
    """do_Lya_demo renders one spectrum per z bin; check_skylines flags
    a MAP detection sitting on a synthetic skyline glitch
    (reference: make_multi_dla_plots.py:584-691)."""
    from gpy_dla_detection_tpu.analysis import paper_plots_multi as pm

    rng = np.random.default_rng(0)
    observations, z_qsos = [], []
    for i, z in enumerate([2.3, 3.1, 4.2]):
        wl = 3600.0 * 10 ** (1e-4 * np.arange(3000))
        flux = np.ones_like(wl) + 0.05 * rng.normal(size=wl.size)
        pm_mask = np.zeros(wl.size, bool)
        observations.append((wl, flux, np.full_like(wl, 0.01), pm_mask))
        z_qsos.append(z)
    plotted = pm.do_Lya_demo(
        observations, z_qsos, str(tmp_path), zmin=2.0, zmax=5.0, nbins=3
    )
    assert plotted == 3
    import os
    assert "Lya_forest_demo.pdf" in os.listdir(tmp_path)

    # inject a skyline glitch at a known pixel of spectrum 1
    wl, flux, nv, msk = observations[1]
    glitch_px = 1200
    flux = flux.copy()
    flux[glitch_px] = -12.0
    observations[1] = (wl, flux, nv, msk)
    z_glitch = wl[glitch_px] / 1215.6701 - 1.0
    map_z = np.full((3, 2), np.nan)
    map_z[1, 0] = z_glitch + 0.002   # on the glitch
    map_z[2, 0] = 3.0                # clean spectrum
    suspects = pm.check_skylines(observations, map_z)
    assert suspects == [(1, float(map_z[1, 0]))]
