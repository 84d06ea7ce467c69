"""LaTeX table emitters for the survey statistics.

Rebuild of the reference's table generators
(reference: CDDF_analysis/make_tables.py:1-119).
"""

from __future__ import annotations

import numpy as np


def cddf_table(l_cent, cddf, cddf68, cddf95) -> str:
    """CDDF results as a LaTeX tabular."""
    lines = [
        r"\begin{tabular}{ccccc}",
        r"$\log N_\mathrm{HI}$ & $f(N)$ & 68\% & 95\% \\",
        r"\hline",
    ]
    for i in range(len(l_cent)):
        lines.append(
            f"{l_cent[i]:.2f} & {cddf[i]:.3e} & "
            f"[{cddf68[i, 0]:.3e}, {cddf68[i, 1]:.3e}] & "
            f"[{cddf95[i, 0]:.3e}, {cddf95[i, 1]:.3e}] \\\\"
        )
    lines.append(r"\end{tabular}")
    return "\n".join(lines)


def line_density_table(z_cent, dndx, dndx68, dndx95) -> str:
    lines = [
        r"\begin{tabular}{cccc}",
        r"$z$ & $dN/dX$ & 68\% & 95\% \\",
        r"\hline",
    ]
    for i in range(len(z_cent)):
        lines.append(
            f"{z_cent[i]:.2f} & {dndx[i]:.4f} & "
            f"[{dndx68[i, 0]:.4f}, {dndx68[i, 1]:.4f}] & "
            f"[{dndx95[i, 0]:.4f}, {dndx95[i, 1]:.4f}] \\\\"
        )
    lines.append(r"\end{tabular}")
    return "\n".join(lines)


def omega_table(z_cent, omega, omega_err) -> str:
    lines = [
        r"\begin{tabular}{ccc}",
        r"$z$ & $10^3\,\Omega_\mathrm{DLA}$ & $\sigma$ \\",
        r"\hline",
    ]
    for i in range(len(z_cent)):
        lines.append(
            f"{z_cent[i]:.2f} & {1e3 * omega[i]:.4f} & {1e3 * omega_err[i]:.4f} \\\\"
        )
    lines.append(r"\end{tabular}")
    return "\n".join(lines)


def detection_table(ids, z_qsos, p_dlas, map_z_dlas, map_log_nhis,
                    p_thresh: float = 0.9, max_rows: int | None = None) -> str:
    """Per-sightline detection table (reference: make_tables.py MAP
    catalog emitters)."""
    idx = np.where(np.asarray(p_dlas) > p_thresh)[0]
    if max_rows:
        idx = idx[:max_rows]
    lines = [
        r"\begin{tabular}{ccccc}",
        r"ID & $z_\mathrm{QSO}$ & $p_\mathrm{DLA}$ & $z_\mathrm{DLA}$ & $\log N_\mathrm{HI}$ \\",
        r"\hline",
    ]
    for i in idx:
        lines.append(
            f"{ids[i]} & {z_qsos[i]:.3f} & {p_dlas[i]:.3f} & "
            f"{map_z_dlas[i, 0, 0]:.3f} & {map_log_nhis[i, 0, 0]:.2f} \\\\"
        )
    lines.append(r"\end{tabular}")
    return "\n".join(lines)
