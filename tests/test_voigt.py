"""Voigt absorption profiles vs the reference implementation."""

import numpy as np
import pytest

from gpy_dla_detection_tpu.ops.voigt import (
    instrumental_broadening,
    voigt_absorption,
    voigt_absorption_civ,
    voigt_absorption_lls,
)

from .reference_oracle import import_reference


def _wavelength_grid(n=1200, lo=3600.0):
    # SDSS-like log-spaced grid, 1e-4 dex pixels
    return lo * 10 ** (1e-4 * np.arange(n))


@pytest.mark.parametrize(
    "z_dla,log_nhi,num_lines",
    [(2.5, 20.3, 3), (3.2, 21.8, 3), (2.1, 23.0, 1), (3.0, 20.0, 5)],
)
def test_voigt_absorption_matches_reference(z_dla, log_nhi, num_lines):
    import_reference()
    from gpy_dla_detection import voigt as ref_voigt

    wl = _wavelength_grid()
    nhi = 10.0**log_nhi
    ref = ref_voigt.voigt_absorption(wl, nhi, z_dla, num_lines=num_lines)
    got = np.asarray(voigt_absorption(wl, np.array([nhi]), np.array([z_dla]), num_lines))
    assert got.shape == (1, wl.shape[0] - 6)
    np.testing.assert_allclose(got[0], ref, atol=1e-8, rtol=1e-6)


def test_voigt_absorption_no_broadening():
    import_reference()
    from gpy_dla_detection import voigt as ref_voigt

    wl = _wavelength_grid(400)
    ref = ref_voigt.voigt_absorption(wl, 10**20.5, 2.8, num_lines=3, broadening=False)
    got = np.asarray(
        voigt_absorption(wl, np.array([10**20.5]), np.array([2.8]), 3, broadening=False)
    )
    np.testing.assert_allclose(got[0], ref, atol=1e-8, rtol=1e-6)


def test_voigt_absorption_batched_consistency():
    wl = _wavelength_grid(600)
    z = np.array([2.2, 2.5, 3.0])
    nhi = 10 ** np.array([20.1, 21.0, 22.5])
    batched = np.asarray(voigt_absorption(wl, nhi, z, 3))
    for i in range(3):
        single = np.asarray(voigt_absorption(wl, nhi[i : i + 1], z[i : i + 1], 3))
        np.testing.assert_allclose(batched[i], single[0], rtol=1e-12)


def test_voigt_lls_matches_reference():
    import_reference()
    from gpy_dla_detection import voigt_lls as ref_lls

    wl = _wavelength_grid(1500, lo=3200.0)
    nhi, z = 10**18.5, 2.7
    ref = ref_lls.voigt_absorption(wl, nhi, z, num_lines=3)
    got = np.asarray(voigt_absorption_lls(wl, np.array([nhi]), np.array([z]), 3))
    np.testing.assert_allclose(got[0], ref, atol=1e-8, rtol=1e-6)


def test_voigt_civ_matches_reference():
    import_reference()
    # the reference uses the long-removed np.float alias (voigt_civ.py:162)
    if not hasattr(np, "float"):
        np.float = np.float64
    from gpy_dla_detection import voigt_civ as ref_civ

    wl = 4700.0 * 10 ** (1e-4 * np.arange(800))
    nciv, z, sig = 10**14.0, 2.1, 2.5e6
    ref = ref_civ.voigt_absorption(wl, nciv, z, sig, num_lines=2)
    got = np.asarray(
        voigt_absorption_civ(wl, np.array([nciv]), np.array([z]), np.array([sig]), 2)
    )
    np.testing.assert_allclose(got[0], ref, atol=1e-8, rtol=1e-6)


def test_instrumental_broadening_matches_convolve():
    import_reference()
    from gpy_dla_detection.voigt import instrument_profile

    rng = np.random.default_rng(0)
    raw = rng.uniform(0.2, 1.0, size=(2, 64))
    got = np.asarray(instrumental_broadening(raw))
    for i in range(2):
        ref = np.convolve(raw[i], instrument_profile, "valid")
        np.testing.assert_allclose(got[i], ref, rtol=1e-12)


def test_voigt_preserves_float32():
    """f32 inputs must stay f32 throughout (x64 mode must not promote
    via numpy constants — regression for the instrument-profile leak)."""
    wl = _wavelength_grid(200).astype(np.float32)
    out = voigt_absorption(wl, np.float32(1e20), np.float32(2.5), 3)
    assert out.dtype == np.float32, out.dtype
    out = voigt_absorption_lls(wl, np.float32(1e18), np.float32(2.5), 3)
    assert out.dtype == np.float32
    out = voigt_absorption_civ(
        4700.0 * 10 ** (1e-4 * np.arange(100, dtype=np.float32)),
        np.float32(1e14), np.float32(2.1), np.float32(2.5e6), 2,
    )
    assert out.dtype == np.float32


@pytest.mark.parametrize("tier", [True, False])
def test_windowed_fast_path_matches_exact(tier, monkeypatch):
    """The CF+windowed-Weideman fast path must match the exact path to
    ~1e-4 on the absorption profile (f32 cancellation at the cores).

    Parametrized over the two-tier window flag (GPY_DLA_WINDOW_TIER,
    bound at import in ops/voigt.py): tier=True is the production
    default, tier=False the documented escape hatch — both must agree
    with the exact path, so neither can rot (ADVICE r3)."""
    import gpy_dla_detection_tpu.ops.voigt as voigt_mod

    monkeypatch.setattr(voigt_mod, "WINDOW_TIER", tier)
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.voigt import (
        _unit_lyman_series_optical_depth,
        _unit_lyman_series_optical_depth_windowed,
    )
    from gpy_dla_detection_tpu.constants import THERMAL_SIGMA_CGS

    wl = _wavelength_grid(1200).astype(np.float32)
    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 2.9, size=64).astype(np.float32)
    nhi = (10.0 ** rng.uniform(20.0, 22.5, size=64)).astype(np.float32)

    tau_fast = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth_windowed(
            jnp.asarray(wl), jnp.asarray(z), 3, THERMAL_SIGMA_CGS
        )
    )
    # same-precision baseline: the windowed trick must add nothing on
    # top of the exact f32 evaluation
    tau_f32 = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth(
            jnp.asarray(wl), jnp.asarray(z), 3, THERMAL_SIGMA_CGS
        )
    )
    err32 = np.abs(
        np.exp(-tau_fast.astype(np.float64)) - np.exp(-tau_f32.astype(np.float64))
    )
    assert err32.max() < 5e-5, err32.max()

    # vs f64 ground truth: bounded by the intrinsic f32 Faddeeva annulus
    # error (~1e-3 on the profile at tau-of-order-1 pixels near a core)
    tau_exact = nhi[:, None].astype(np.float64) * np.asarray(
        _unit_lyman_series_optical_depth(
            jnp.asarray(wl, jnp.float64),
            jnp.asarray(z, jnp.float64),
            3,
            THERMAL_SIGMA_CGS,
        )
    )
    err = np.abs(np.exp(-tau_fast.astype(np.float64)) - np.exp(-tau_exact))
    assert err.max() < 5e-3, err.max()
    assert np.median(err) < 1e-6


@pytest.mark.parametrize("tier", [True, False])
def test_windowed_center_estimate_irregular_grid(tier, monkeypatch):
    """The f32 windowed path locates each line-center window by a
    chunk-level count plus a LINEAR within-chunk estimate (no
    searchsorted, no gather — ops/voigt.py).  On the log-uniform SDSS
    grid the estimate is exact to ~0.01 px; this pins the robustness
    margin on a STRESSED grid whose per-pixel log-spacing is jittered
    by ±30% (far rougher than any masked/cut SDSS grid): the window
    must still cover every core, i.e. windowed == exact-f32 to the
    usual tolerance, including at the sampler's logNHI ceiling.
    Parametrized over the two-tier window flag (ADVICE r3)."""
    import gpy_dla_detection_tpu.ops.voigt as voigt_mod

    monkeypatch.setattr(voigt_mod, "WINDOW_TIER", tier)
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.constants import THERMAL_SIGMA_CGS
    from gpy_dla_detection_tpu.ops.voigt import (
        _unit_lyman_series_optical_depth,
        _unit_lyman_series_optical_depth_windowed,
    )

    rng = np.random.default_rng(5)
    dlog = 1e-4 * rng.uniform(0.7, 1.3, size=1200)
    wl = (3600.0 * 10 ** np.concatenate([[0.0], np.cumsum(dlog[:-1])])).astype(
        np.float32
    )
    z = rng.uniform(2.0, 2.9, size=48).astype(np.float32)
    nhi = (10.0 ** rng.uniform(20.0, 23.0, size=48)).astype(np.float32)

    tau_fast = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth_windowed(
            jnp.asarray(wl), jnp.asarray(z), 3, THERMAL_SIGMA_CGS
        )
    )
    tau_f32 = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth(
            jnp.asarray(wl), jnp.asarray(z), 3, THERMAL_SIGMA_CGS
        )
    )
    err = np.abs(
        np.exp(-tau_fast.astype(np.float64))
        - np.exp(-tau_f32.astype(np.float64))
    )
    assert err.max() < 5e-5, err.max()


def test_windowed_far_field_truncation_all_lines():
    """With the full 31-line series at the sampler's logNHI ceiling,
    the windowed path's far-field reductions (direct Lorentzian rational
    + no far field beyond FAR_FIELD_LINES) must stay within the f32
    windowed-path error budget vs the exact f64 evaluation
    (ops/voigt.py FAR_FIELD_LINES bound)."""
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.constants import THERMAL_SIGMA_CGS
    from gpy_dla_detection_tpu.ops.voigt import (
        _unit_lyman_series_optical_depth,
        _unit_lyman_series_optical_depth_windowed,
    )

    wl = _wavelength_grid(1200).astype(np.float32)
    rng = np.random.default_rng(5)
    # z high enough that the upper series lands on the grid; NHI at the
    # top of the sampled range where the dropped far wings are largest
    z = rng.uniform(2.5, 2.9, size=16).astype(np.float32)
    nhi = (10.0 ** rng.uniform(22.5, 23.0, size=16)).astype(np.float32)

    tau_fast = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth_windowed(
            jnp.asarray(wl), jnp.asarray(z), 31, THERMAL_SIGMA_CGS
        )
    )
    # same-precision baseline: isolates the windowed-path reductions
    # from the intrinsic f32 core-cancellation error (the plain exact
    # f32 evaluation itself reaches ~1.7e-2 vs f64 at a saturated core
    # pixel at these columns — measured identical with and without the
    # far-field reductions)
    tau_f32 = nhi[:, None] * np.asarray(
        _unit_lyman_series_optical_depth(
            jnp.asarray(wl), jnp.asarray(z), 31, THERMAL_SIGMA_CGS
        )
    )
    err32 = np.abs(
        np.exp(-tau_fast.astype(np.float64))
        - np.exp(-tau_f32.astype(np.float64))
    )
    assert err32.max() < 5e-5, err32.max()

    tau_exact = nhi[:, None].astype(np.float64) * np.asarray(
        _unit_lyman_series_optical_depth(
            jnp.asarray(wl, jnp.float64),
            jnp.asarray(z, jnp.float64),
            31,
            THERMAL_SIGMA_CGS,
        )
    )
    err = np.abs(np.exp(-tau_fast.astype(np.float64)) - np.exp(-tau_exact))
    assert err.max() < 2e-2, err.max()  # f32 core cancellation bound
    assert np.median(err) < 1e-6, np.median(err)


def test_absorption_tail_pallas_matches_jnp():
    """The fused exp+broadening kernel (interpret mode) equals the jnp
    composition, including the non-divisor sample-count pad path."""
    import jax.numpy as jnp
    import numpy as np

    from gpy_dla_detection_tpu.ops.voigt import instrumental_broadening
    from gpy_dla_detection_tpu.ops.voigt_pallas import (
        absorption_from_unit_tau_pallas,
    )

    rng = np.random.default_rng(0)
    for S in (16, 23):  # 23 exercises the pad-to-block path
        tau = jnp.asarray(rng.uniform(0, 3, (S, 70)).astype(np.float32))
        nhi = jnp.asarray(10 ** rng.uniform(20, 22, S).astype(np.float32))
        want = instrumental_broadening(jnp.exp(-nhi[:, None] * tau))
        got = absorption_from_unit_tau_pallas(tau, nhi, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=1e-7
        )


def test_windowed_parts_and_placement_kernel():
    """The unplaced windowed-tau parts + Pallas placement kernel
    (interpret mode) reproduce the dense windowed path exactly."""
    import jax.numpy as jnp
    import numpy as np

    from gpy_dla_detection_tpu.ops.voigt import (
        WindowedTauParts,
        _place_windows,
        _unit_lyman_series_optical_depth_windowed,
        _windowed_tau_parts,
        absorption_from_unit_tau,
    )
    from gpy_dla_detection_tpu.ops.voigt_pallas import absorption_windowed_pallas
    from gpy_dla_detection_tpu import constants as C

    rng = np.random.default_rng(2)
    P = 300
    wl = jnp.asarray(
        (1215.67 * 3.9 * 10 ** (1e-4 * np.arange(P))).astype(np.float32)
    )
    S = 24
    z = jnp.asarray(rng.uniform(2.9, 3.8, S).astype(np.float32))
    nhi = jnp.asarray(10 ** rng.uniform(20, 21.5, S).astype(np.float32))

    dense = _unit_lyman_series_optical_depth_windowed(
        wl, z, 3, C.THERMAL_SIGMA_CGS
    )
    parts = _windowed_tau_parts(wl, z, 3, C.THERMAL_SIGMA_CGS)
    np.testing.assert_allclose(
        np.asarray(_place_windows(parts)), np.asarray(dense), rtol=0, atol=0
    )

    from gpy_dla_detection_tpu.ops.voigt import instrumental_broadening

    want = instrumental_broadening(jnp.exp(-nhi[:, None] * dense))
    got = absorption_windowed_pallas(parts, nhi, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=1e-7
    )

    # the CPU fallback of absorption_from_unit_tau places the parts
    got2 = absorption_from_unit_tau(parts, nhi)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=2e-6, atol=1e-7
    )


@pytest.mark.parametrize(
    "wtier,poly", [(False, False), (True, False), (False, True)]
)
def test_absorption_all_pallas_matches_windowed(monkeypatch, wtier, poly):
    """The fully fused absorption kernel (far field + windows +
    placement + exp + broadening + encode in one pallas_call, interpret
    mode) matches the dense windowed path for every family, on both a
    regular and a ±30% jittered log grid, with the XLA oracle's
    two-tier window evaluation (WINDOW_TIER) both off and on.

    Tolerances: at pixels 1-2 px from a line core the f32 Weideman
    evaluation computes a ~1e-13-scale w from O(1) intermediates —
    cancellation puts BOTH Weideman paths ~1e-3 (absorption units)
    from the f64 exact oracle, and fusion-order/FMA differences move
    them within that shared noise floor (measured: mutual 3.5e-4 max
    while each sits 0.8-1.2e-3 from truth).  The poly path evaluates
    exp(-u) directly (no cancellation) and measures ~20x CLOSER to
    truth (4.7e-5), so its mutual difference vs the XLA path IS the
    XLA path's own error — the mutual bound loosens to 2e-3 and the
    truth-anchored bound tightens to "at least as accurate"."""
    import gpy_dla_detection_tpu.ops.voigt as V

    monkeypatch.setattr(V, "WINDOW_TIER", wtier)
    import jax.numpy as jnp

    from gpy_dla_detection_tpu import constants as C
    from gpy_dla_detection_tpu.ops.voigt import (
        _unit_lyman_series_optical_depth,
        _unit_lyman_series_optical_depth_windowed,
        instrumental_broadening,
    )
    from gpy_dla_detection_tpu.ops.voigt_pallas import (
        absorption_all_pallas,
        absorption_from_unit_tau_pallas,
    )

    rng = np.random.default_rng(3)
    P = 300
    base = 1215.67 * 3.9 * 10 ** (1e-4 * np.arange(P))
    steps = np.diff(base) * (1.0 + 0.3 * rng.uniform(-1, 1, P - 1))
    jittered = base[0] + np.concatenate([[0.0], np.cumsum(steps)])
    S = 24
    z = jnp.asarray(rng.uniform(2.9, 3.8, S).astype(np.float32))
    nhi_dla = jnp.asarray(10 ** rng.uniform(20, 22, S).astype(np.float32))
    nhi_sub = jnp.asarray(10 ** rng.uniform(19.5, 20.3, S).astype(np.float32))

    for grid in (base, jittered):
        wl = jnp.asarray(grid.astype(np.float32))
        dense = _unit_lyman_series_optical_depth_windowed(
            wl, z, 3, C.THERMAL_SIGMA_CGS
        )
        tau64 = _unit_lyman_series_optical_depth(
            jnp.asarray(np.asarray(wl, np.float64)),
            jnp.asarray(np.asarray(z, np.float64)),
            3,
            C.THERMAL_SIGMA_CGS,
        )
        got = absorption_all_pallas(
            wl, z, (nhi_dla, nhi_sub), 3, interpret=True, poly=poly
        )
        for g, n in zip(got, (nhi_dla, nhi_sub)):
            want = instrumental_broadening(jnp.exp(-n[:, None] * dense))
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(want), rtol=0,
                atol=2e-3 if poly else 5e-4,
            )
            # truth-anchored: the fused kernel must be AS accurate as
            # the XLA windowed path it replaces (the poly path must be
            # at least as close — it measures ~20x closer)
            n64 = jnp.asarray(np.asarray(n, np.float64))
            truth = np.asarray(
                instrumental_broadening(jnp.exp(-n64[:, None] * tau64))
            )
            e_got = np.abs(np.asarray(g, np.float64) - truth).max()
            e_want = np.abs(np.asarray(want, np.float64) - truth).max()
            bound = e_want + 1e-4 if poly else max(1.5 * e_want, 1e-4)
            assert e_got <= bound, (e_got, e_want)

        # packed i16-pair encode: the int32 output must be exactly the
        # fixed-point encode of the kernel's own f32 output (the
        # storage format is independent of which kernel produced it)
        gf = absorption_all_pallas(
            wl, z, (nhi_dla,), 3, interpret=True, poly=poly
        )[0]
        got_p = absorption_all_pallas(
            wl, z, (nhi_dla,), 3, interpret=True, poly=poly,
            out_dtype=jnp.int32,
        )[0]
        codes = np.round(np.asarray(gf) * 32767.0).astype(np.int32)
        h = codes.shape[1] // 2
        expect = codes[:, :h] | (codes[:, h:] << 16)
        np.testing.assert_array_equal(np.asarray(got_p), expect)


def test_absorption_all_pallas_lls_break(monkeypatch):
    """The fused kernel's Lyman-limit break (lls_break=True, interpret
    mode) matches voigt_absorption_lls — the break is linear in nhi and
    rides the shared unit tau."""
    import gpy_dla_detection_tpu.ops.voigt as V

    monkeypatch.setattr(V, "WINDOW_TIER", False)
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.voigt import voigt_absorption_lls
    from gpy_dla_detection_tpu.ops.voigt_pallas import absorption_all_pallas

    rng = np.random.default_rng(5)
    P = 1664
    # grid reaching blueward of the Lyman limit (the LLS search window)
    wl = jnp.asarray(
        (850.0 * 4.2 * 10 ** (1e-4 * np.arange(P))).astype(np.float32)
    )
    S = 16
    z = jnp.asarray(rng.uniform(3.0, 3.6, S).astype(np.float32))
    nhi = jnp.asarray(10 ** rng.uniform(17.5, 20.5, S).astype(np.float32))

    # off-TPU resolve_voigt_impl forces "exact", so this pins the fused
    # kernel against the exact-f32 oracle: the tolerance carries both
    # the windowed-vs-exact far-field truncation (~5e-5) and the shared
    # near-core f32 cancellation floor (~1e-3; see the windowed parity
    # test above)
    want = voigt_absorption_lls(wl, nhi, z, 3, impl="exact")
    got = absorption_all_pallas(
        wl, z, (nhi,), 3, interpret=True, lls_break=True
    )[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2.5e-3
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    # away from the cancellation floor the agreement must be tight:
    # the near-core population is ~0.7% of pixels (~4 px x 3 lines per
    # sample), so the 99th percentile must sit at the far-field level
    assert np.quantile(err, 0.99) < 5e-5, np.quantile(err, 0.99)


def test_fused_absorption_orchestration_parity():
    """batch_evidences with the fused absorption kernel (forced on via
    monkeypatched gates, interpret mode) matches the parts + placement
    composition it replaces."""
    import jax
    import jax.numpy as jnp

    import gpy_dla_detection_tpu.parallel.batch as B
    from gpy_dla_detection_tpu.data.samples import (
        generate_dla_samples,
        generate_subdla_samples,
    )
    from gpy_dla_detection_tpu.data.spectrum import astype
    from gpy_dla_detection_tpu.data.synthetic import (
        synthetic_learned_model,
        synthetic_spectrum,
    )
    from gpy_dla_detection_tpu.data.spectrum import stack
    from gpy_dla_detection_tpu.ops import voigt_pallas as VP
    from gpy_dla_detection_tpu.params import Parameters

    params = Parameters(num_dla_samples=128, num_pixels_padded=256,
                        min_lambda=1140.0, max_lambda=1190.0,
                        normalization_min_lambda=1195.0,
                        normalization_max_lambda=1215.0)
    learned = synthetic_learned_model(params)
    dla_s = generate_dla_samples(params)
    sub_s = generate_subdla_samples(params)
    specs = stack([
        astype(synthetic_spectrum(params, learned, 3.0 + 0.1 * i, seed=i),
               np.float32)
        for i in range(2)
    ])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    learned32 = learned.astype(np.float32)

    def run():
        return B._evidences_fn(params, 2, None, "windowed", True)(
            learned32, specs,
            jnp.asarray(dla_s.offset_samples, jnp.float32),
            jnp.asarray(dla_s.log_nhi_samples, jnp.float32),
            jnp.asarray(dla_s.nhi_samples, jnp.float32),
            jnp.asarray(dla_s.offset_samples, jnp.float32),
            jnp.asarray(sub_s.log_nhi_samples, jnp.float32),
            jnp.asarray(sub_s.nhi_samples, jnp.float32),
            keys,
        )

    base = run()

    orig = VP.absorption_all_pallas
    forced = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    old_on_tpu, old_fused = B.on_tpu, B.FUSED_ABS
    VP.absorption_all_pallas = forced
    B.on_tpu, B.FUSED_ABS = (lambda x: True), True
    try:
        fused = run()
    finally:
        VP.absorption_all_pallas = orig
        B.on_tpu, B.FUSED_ABS = old_on_tpu, old_fused

    np.testing.assert_allclose(
        np.asarray(fused.log_evidence_null),
        np.asarray(base.log_evidence_null), rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fused.dla.log_evidences),
        np.asarray(base.dla.log_evidences), rtol=0, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fused.subdla.log_evidences),
        np.asarray(base.subdla.log_evidences), rtol=0, atol=2e-3,
    )
