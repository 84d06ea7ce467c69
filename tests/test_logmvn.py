"""Low-rank MVN log density vs scipy and the reference implementation."""

import numpy as np
from scipy.stats import multivariate_normal

from gpy_dla_detection_tpu.ops.logmvn import (
    batched_log_mvnpdf,
    log_mvnpdf_iid,
    log_mvnpdf_low_rank,
    pair_basis,
)

from .reference_oracle import import_reference


def _problem(n=300, k=8, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=n)
    mu = rng.normal(size=n)
    M = rng.normal(size=(n, k)) / np.sqrt(k)
    d = rng.uniform(0.5, 2.0, size=n)
    return y, mu, M, d


def test_log_mvnpdf_vs_scipy():
    y, mu, M, d = _problem()
    cov = M @ M.T + np.diag(d)
    ref = multivariate_normal(mean=mu, cov=cov).logpdf(y)
    got = float(log_mvnpdf_low_rank(y, mu, M, d))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_log_mvnpdf_vs_reference():
    import_reference()
    from gpy_dla_detection.null_gp import NullGP

    y, mu, M, d = _problem(seed=1)
    ref = float(NullGP.log_mvnpdf_low_rank(y, mu, M, d))
    got = float(log_mvnpdf_low_rank(y, mu, M, d))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_log_mvnpdf_masked_equals_dense_subset():
    y, mu, M, d = _problem(seed=2)
    mask = np.ones(y.shape, dtype=bool)
    mask[::7] = False
    got = float(log_mvnpdf_low_rank(y, mu, M, d, mask))
    ref = float(
        log_mvnpdf_low_rank(y[mask], mu[mask], M[mask], d[mask])
    )
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_log_mvnpdf_iid_vs_scipy():
    y, mu, _, d = _problem(seed=3)
    ref = multivariate_normal(mean=mu, cov=np.diag(d)).logpdf(y)
    got = float(log_mvnpdf_iid(y, mu, d))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_batched_log_mvnpdf_matches_single():
    rng = np.random.default_rng(4)
    n, k, S = 257, 6, 5
    y = rng.normal(size=n)
    mu = rng.uniform(0.5, 1.5, size=n)
    M = rng.normal(size=(n, k)) / np.sqrt(k)
    omega2 = rng.uniform(0.05, 0.2, size=n)
    v = rng.uniform(0.2, 0.5, size=n)
    mask = rng.uniform(size=n) > 0.1
    absorption = rng.uniform(0.3, 1.0, size=(S, n))

    got = np.asarray(
        batched_log_mvnpdf(y, mu, M, omega2, v, mask, absorption, pair_basis(M))
    )
    for s in range(S):
        a = absorption[s]
        ref = float(
            log_mvnpdf_low_rank(
                y, mu * a, M * a[:, None], omega2 * a * a + v, mask
            )
        )
        np.testing.assert_allclose(got[s], ref, rtol=1e-9)


def test_batched_pallas_kernel_small_rank():
    """The fused kernel must handle ranks other than 20 (the CIV model
    uses its own rank) and ill-conditioned capacitances.  On real TPUs
    this regression additionally guards the MXU precision of the
    rank-1-update selection matmuls: at bf16 DEFAULT precision the
    Cholesky diagonals go negative and the evidences come out NaN
    (found on the CIV model; ops/logmvn_pallas.py)."""
    import jax
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.logmvn import batched_log_mvnpdf

    rng = np.random.default_rng(3)
    N, k, S = 700, 5, 64
    M = (0.05 * np.sin(np.arange(N)[:, None] / 40.0 + np.arange(k))).astype(
        np.float32
    )
    args = [
        (1 + 0.01 * rng.normal(size=N)).astype(np.float32),  # y
        np.ones(N, np.float32),  # mu
        M,
        np.zeros(N, np.float32),  # omega2 = 0 (the CIV configuration)
        np.full(N, 0.03**2, np.float32),  # v small -> large capacitance
        np.ones(N, bool),
    ]
    absorption = np.exp(-rng.random((S, N))).astype(np.float32)
    args = [jnp.asarray(x) for x in args]
    a = np.asarray(batched_log_mvnpdf(*args, jnp.asarray(absorption), use_pallas=False))
    b = np.asarray(batched_log_mvnpdf(*args, jnp.asarray(absorption), use_pallas=True))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=5e-3 * np.mean(np.abs(a)))


def test_pallas_chain_layouts_agree():
    """Row-layout and transposed (samples-on-lanes) factorization-chain
    kernels must agree with the XLA composition, including when the
    sample count needs lane padding (S not a multiple of 128) and with
    a chained ``extra`` factor (ops/logmvn_pallas.py)."""
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.logmvn import batched_log_mvnpdf
    from gpy_dla_detection_tpu.ops.logmvn_pallas import (
        batched_log_mvnpdf_pallas,
    )

    rng = np.random.default_rng(7)
    N, k, S = 512, 4, 72  # S=72: pads to 80 rows, then to 128 lanes
    M = (rng.normal(size=(N, k)) / np.sqrt(k) * 0.1).astype(np.float32)
    y = (1 + 0.1 * rng.normal(size=N)).astype(np.float32)
    mu = np.ones(N, np.float32)
    omega2 = rng.uniform(0.01, 0.05, N).astype(np.float32)
    v = rng.uniform(0.02, 0.1, N).astype(np.float32)
    mask = rng.uniform(size=N) > 0.1
    absorption = np.exp(-rng.random((S, N))).astype(np.float32)
    extra = np.exp(-rng.random((S, N))).astype(np.float32)

    args = [jnp.asarray(x) for x in (y, mu, M, omega2, v, mask)]
    A = jnp.asarray(absorption)
    ref = np.asarray(
        batched_log_mvnpdf(
            *args, A, use_pallas=False, extra=jnp.asarray(extra)
        )
    )
    # the surviving chain matrix (round 5 deleted the rejected
    # row-layout, fused single-kernel and four-dot variants): flat
    # transposed rank-1/rank-2 (the packed=0 ablation + odd-k
    # semantics), packed rank-1 (odd-k fallback under packed), the
    # production packed rank-2 combined-dot, and both u-dot lowerings
    for chain_r2, packed, u_split in (
        (False, False, None),  # flat rank-1 (odd-k shape of the t path)
        (True, False, None),   # flat rank-2 (GPY_DLA_PACKED=0 ablation)
        (False, True, None),   # packed rank-1 (odd-k fallback)
        (True, True, None),    # PRODUCTION: packed rank-2 combined dot
        (True, True, True),    # 3-pass bf16-split u dot
        (True, True, False),   # 6-pass HIGHEST u dot
    ):
        got = np.asarray(
            batched_log_mvnpdf_pallas(
                *args, A, pair_basis(args[2]), k,
                interpret=True, extra=jnp.asarray(extra),
                chain_r2=chain_r2, packed=packed, u_split=u_split,
            )
        )
        np.testing.assert_allclose(
            got, ref, atol=5e-3 * np.mean(np.abs(ref)),
            err_msg=f"chain_r2={chain_r2} "
                    f"packed={packed} u_split={u_split}",
        )


def test_pallas_i16_profile_decode():
    """int16 fixed-point and int32 packed-pair absorption/stream
    storage (GPY_DLA_ABS_DTYPE, models/evidence.py) must decode
    identically in the Pallas kernel and the XLA composition, including
    the padding rows (full-scale code = absorption 1.0) when S is not
    block-aligned."""
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.kernel_config import ABS_I16_SCALE
    from gpy_dla_detection_tpu.ops.logmvn import batched_log_mvnpdf
    from gpy_dla_detection_tpu.ops.logmvn_pallas import (
        batched_log_mvnpdf_pallas,
    )
    from gpy_dla_detection_tpu.ops.voigt import encode_profile_store

    rng = np.random.default_rng(3)
    N, k, S = 512, 4, 72  # pads to 80 rows in the kernel wrapper
    M = (rng.normal(size=(N, k)) / np.sqrt(k) * 0.1).astype(np.float32)
    y = (1 + 0.1 * rng.normal(size=N)).astype(np.float32)
    mu = np.ones(N, np.float32)
    omega2 = rng.uniform(0.01, 0.05, N).astype(np.float32)
    v = rng.uniform(0.02, 0.1, N).astype(np.float32)
    mask = rng.uniform(size=N) > 0.1
    absorption = np.exp(-rng.random((S, N))).astype(np.float32)
    extra = np.exp(-rng.random((S, N))).astype(np.float32)

    args = [jnp.asarray(x) for x in (y, mu, M, omega2, v, mask)]
    ref16 = None
    for store in (jnp.int16, jnp.int32):
        A = encode_profile_store(jnp.asarray(absorption), store)
        E = encode_profile_store(jnp.asarray(extra), store)
        ref = np.asarray(
            batched_log_mvnpdf(*args, A, use_pallas=False, extra=E)
        )
        got = np.asarray(
            batched_log_mvnpdf_pallas(
                *args, A, pair_basis(args[2]), k, interpret=True, extra=(E,)
            )
        )
        np.testing.assert_allclose(
            got, ref, atol=5e-3 * np.mean(np.abs(ref)), err_msg=str(store)
        )
        if ref16 is None:
            ref16 = ref
        else:
            # packed pairs hold exactly the plain i16 codes
            np.testing.assert_array_equal(ref, ref16)


def test_pallas_multi_extra_streams():
    """``extra`` as a tuple of chained-absorber streams (multiplied in
    VMEM, the level >= 3 evidence configuration) must equal the XLA
    composition with the materialized product (ops/logmvn_pallas.py)."""
    import jax.numpy as jnp

    from gpy_dla_detection_tpu.ops.logmvn import batched_log_mvnpdf
    from gpy_dla_detection_tpu.ops.logmvn_pallas import (
        batched_log_mvnpdf_pallas,
    )

    rng = np.random.default_rng(11)
    N, k, S = 512, 4, 48
    M = (rng.normal(size=(N, k)) / np.sqrt(k) * 0.1).astype(np.float32)
    y = (1 + 0.1 * rng.normal(size=N)).astype(np.float32)
    mu = np.ones(N, np.float32)
    omega2 = rng.uniform(0.01, 0.05, N).astype(np.float32)
    v = rng.uniform(0.02, 0.1, N).astype(np.float32)
    mask = rng.uniform(size=N) > 0.1
    absorption = np.exp(-rng.random((S, N))).astype(np.float32)
    e1, e2, e3 = (
        np.exp(-rng.random((S, N))).astype(np.float32) for _ in range(3)
    )

    args = [jnp.asarray(x) for x in (y, mu, M, omega2, v, mask)]
    A = jnp.asarray(absorption)
    for extras in ((e1,), (e1, e2), (e1, e2, e3)):
        prod = np.prod(np.stack(extras), axis=0)
        ref = np.asarray(
            batched_log_mvnpdf(
                *args, A, use_pallas=False, extra=jnp.asarray(prod)
            )
        )
        got = np.asarray(
            batched_log_mvnpdf_pallas(
                *args, A, pair_basis(args[2]), k, interpret=True,
                extra=tuple(jnp.asarray(e) for e in extras),
            )
        )
        np.testing.assert_allclose(
            got, ref, atol=5e-3 * np.mean(np.abs(ref)),
            err_msg=f"n_extra={len(extras)}",
        )
