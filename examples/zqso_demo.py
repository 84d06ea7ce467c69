"""Quasar redshift estimation demo on synthetic spectra.

Script twin of the reference's "Quasar Redshift Estimations.ipynb"
notebook: build a wide-window zQSO GP, generate spectra at known
redshifts, run the vmapped z-grid scan (the reference notebook loops
10,000 serial set_data calls — reference: zqso_gp.py:214-250), and save
the per-spectrum posterior-scan figure.

Run:  python examples/zqso_demo.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(outdir="/tmp/zqso_demo"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gpy_dla_detection_tpu.data.synthetic import synthetic_z_observation
    from gpy_dla_detection_tpu.models.zqso import (
        inference_z_qso,
        prepare_z_spectrum,
    )
    from gpy_dla_detection_tpu.params import ZParameters

    os.makedirs(outdir, exist_ok=True)
    params = ZParameters(num_zqso_samples=2000)

    z_trues = [2.5, 3.1, 4.0]
    fig, axes = plt.subplots(len(z_trues), 1, figsize=(10, 3 * len(z_trues)))
    for ax, z_true in zip(np.atleast_1d(axes), z_trues):
        learned, (wl, flux, nv, pm) = synthetic_z_observation(z_true, seed=1)
        spec = prepare_z_spectrum(wl, flux, nv, pm, params.num_pixels_padded)
        z_map, lls, z_grid = inference_z_qso(learned, spec, params)
        print(f"z_true = {z_true:.3f} -> z_map = {z_map:.3f}")
        assert abs(z_map - z_true) < 0.5, (z_map, z_true)

        finite = np.isfinite(lls)
        ax.plot(z_grid[finite], lls[finite], lw=0.6)
        ax.axvline(z_true, color="C2", ls="--", label=f"truth {z_true}")
        ax.axvline(z_map, color="C3", ls=":", label=f"MAP {z_map:.3f}")
        ax.set_xlabel("z_qso")
        ax.set_ylabel("log evidence")
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "zqso_scan.png"), dpi=100)
    print(f"wrote {outdir}/zqso_scan.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
