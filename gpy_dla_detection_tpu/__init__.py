"""TPU-native Bayesian DLA detection in quasar spectra.

A ground-up JAX/XLA/Pallas rebuild of the Garnett/Ho Gaussian-process
DLA detection pipeline (see README.md).
"""

import os as _os

# The tunneled-TPU PJRT plugin registered its platform as "axon" in
# earlier runtimes and as "tpu" in current ones.  An inherited
# JAX_PLATFORMS=axon makes backend init fail outright on the new
# runtime ("not in the list of known backends: ['cpu', 'tpu']"), so
# drop the stale hint and let JAX auto-choose — auto-choice prefers
# the accelerator plugin over cpu under either name.  Explicit
# cpu/tpu requests (e.g. the test suite's JAX_PLATFORMS=cpu) pass
# through untouched.  This runs at package import, which every entry
# point does before its first backend use (backend init is lazy).
if "axon" in _os.environ.get("JAX_PLATFORMS", "").split(","):
    # keep any other explicitly requested platforms (e.g. "axon,cpu"
    # falls back to cpu, not to auto-choice)
    _kept = ",".join(
        p for p in _os.environ["JAX_PLATFORMS"].split(",") if p and p != "axon"
    )
    if _kept:
        _os.environ["JAX_PLATFORMS"] = _kept
    else:
        del _os.environ["JAX_PLATFORMS"]
    # jax latches the env var into its config at import time — if it
    # was imported before this package, clear the latched value too
    # (backend init itself is still lazy, so this is race-free as long
    # as no device has been touched yet)
    import sys as _sys

    if "jax" in _sys.modules:
        _sys.modules["jax"].config.update("jax_platforms", _kept or None)

from .params import CIVParameters, Parameters, ZParameters

__version__ = "0.1.0"

__all__ = [
    "Parameters",
    "ZParameters",
    "CIVParameters",
    "__version__",
]
