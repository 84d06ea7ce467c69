"""Preloader: batch preprocessing, filter flags, SNRs, artifact I/O."""

import numpy as np

from gpy_dla_detection_tpu.data.build_catalog import (
    FILTER_MIN_PIXELS,
    FILTER_NORMALIZATION,
)
from gpy_dla_detection_tpu.data.preload import (
    compute_snrs,
    load_preloaded,
    preload_spectra,
    save_preloaded,
)
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model,
    synthetic_observation,
)
from gpy_dla_detection_tpu.params import Parameters


def _fake_read(store):
    return lambda name: store[name]


def test_preload_filters_and_snrs(tmp_path):
    params = Parameters()
    learned = synthetic_learned_model(params)

    store = {}
    names, zs = [], []
    # good spectrum
    store["good"] = synthetic_observation(params, learned, 3.0, seed=1)
    names.append("good"); zs.append(3.0)
    # unnormalizable: all flux NaN in the normalization window
    wl, fx, nv, pm = synthetic_observation(params, learned, 3.0, seed=2)
    rest = wl / 4.0
    fx = fx.copy()
    fx[(rest >= params.normalization_min_lambda) & (rest <= params.normalization_max_lambda)] = np.nan
    store["badnorm"] = (wl, fx, nv, pm)
    names.append("badnorm"); zs.append(3.0)
    # too few pixels: mask almost everything except the normalization
    # window (so the min-pixel filter, not the normalization filter, fires)
    wl, fx, nv, pm = synthetic_observation(params, learned, 3.0, seed=3)
    pm = pm.copy(); pm[:] = True
    rest3 = wl / 4.0
    pm[(rest3 >= params.normalization_min_lambda) & (rest3 <= params.normalization_max_lambda)] = False
    in_window = (rest3 >= params.min_lambda) & (rest3 <= params.max_lambda)
    idx = np.where(in_window)[0][:50]
    pm[idx] = False
    store["fewpix"] = (wl, fx, nv, pm)
    names.append("fewpix"); zs.append(3.0)

    spectra, flags = preload_spectra(names, zs, params, read_spec=_fake_read(store))
    assert spectra[0] is not None and flags[0] == 0
    assert spectra[1] is None and flags[1] & FILTER_NORMALIZATION
    assert spectra[2] is None and flags[2] & FILTER_MIN_PIXELS

    snrs = compute_snrs(spectra)
    assert snrs[0] > 1.0 and snrs[1] == -1.0 and snrs[2] == -1.0

    path = str(tmp_path / "preloaded.h5")
    save_preloaded(path, spectra, ids=names)
    batch, kept = load_preloaded(path)
    assert list(kept) == [0]
    assert batch.flux.shape == (1, params.num_pixels_padded)
    np.testing.assert_allclose(batch.flux[0], np.asarray(spectra[0].flux))
