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
