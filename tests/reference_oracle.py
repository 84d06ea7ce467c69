"""Import helper for the reference implementation used as a conformance
oracle in tests.  The reference tree is mounted read-only; tests that
need it are skipped when it is absent (e.g. in a standalone checkout).
"""

import os
import sys

import pytest

REFERENCE_PATH = "/root/reference"


def import_reference():
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "gpy_dla_detection")):
        pytest.skip("reference implementation not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # the reference imports emcee/matplotlib at module scope; emcee is
    # not installed here, and we never exercise its MCMC in conformance
    # tests — stub it out
    import types

    if "emcee" not in sys.modules:
        emcee_stub = types.ModuleType("emcee")
        emcee_stub.EnsembleSampler = object
        sys.modules["emcee"] = emcee_stub

    import gpy_dla_detection  # noqa: F401

    return gpy_dla_detection
