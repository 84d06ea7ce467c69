"""Vmapped affine-invariant ensemble MCMC.

Native replacement for the reference's emcee dependency (reference:
gpy_dla_detection/dla_gp.py:227-309, civ_gp.py:77-156): the Goodman &
Weare (2010) stretch move over a walker ensemble, with the whole
ensemble advanced per step as two half-updates under ``vmap`` and the
step loop under ``lax.scan`` — the entire chain runs on-device as one
compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EnsembleState(NamedTuple):
    positions: jnp.ndarray  # (W, D)
    log_probs: jnp.ndarray  # (W,)


def _stretch_half(key, active, passive, log_prob_active, log_prob_fn, a):
    """One stretch-move update of the active half against the passive half."""
    W = active.shape[0]
    D = active.shape[1]
    k_z, k_pick, k_accept = jax.random.split(key, 3)

    # z ~ g(z) with g(z) proportional to 1/sqrt(z) on [1/a, a]
    u = jax.random.uniform(k_z, (W,), active.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a

    partners = jax.random.randint(k_pick, (W,), 0, passive.shape[0])
    x_partner = passive[partners]
    proposal = x_partner + z[:, None] * (active - x_partner)

    log_prob_new = log_prob_fn(proposal)
    log_accept = (D - 1.0) * jnp.log(z) + log_prob_new - log_prob_active
    accept = jnp.log(jax.random.uniform(k_accept, (W,), active.dtype)) < log_accept

    new_active = jnp.where(accept[:, None], proposal, active)
    new_log_prob = jnp.where(accept, log_prob_new, log_prob_active)
    return new_active, new_log_prob, accept


@partial(jax.jit, static_argnames=("log_prob_fn", "num_steps", "a"))
def run_ensemble(
    key: jax.Array,
    initial_positions: jnp.ndarray,
    log_prob_fn: Callable,
    num_steps: int,
    a: float = 2.0,
):
    """Run the stretch-move ensemble sampler.

    :param initial_positions: (W, D) initial walker positions (W even).
    :param log_prob_fn: vmapped-compatible ``(W, D) -> (W,)`` log target.
    :param num_steps: chain length.
    :return: (chain (num_steps, W, D), log_probs (num_steps, W),
        acceptance_rate scalar)
    """
    W = initial_positions.shape[0]
    half = W // 2
    assert W % 2 == 0, "number of walkers must be even"

    log_prob0 = log_prob_fn(initial_positions)
    state = EnsembleState(initial_positions, log_prob0)

    def step(state, key):
        k1, k2 = jax.random.split(key)
        pos, lp = state.positions, state.log_probs
        first, second = pos[:half], pos[half:]
        lp1, lp2 = lp[:half], lp[half:]

        first, lp1, acc1 = _stretch_half(k1, first, second, lp1, log_prob_fn, a)
        second, lp2, acc2 = _stretch_half(k2, second, first, lp2, log_prob_fn, a)

        new_state = EnsembleState(
            jnp.concatenate([first, second]), jnp.concatenate([lp1, lp2])
        )
        n_accept = jnp.sum(acc1) + jnp.sum(acc2)
        return new_state, (new_state.positions, new_state.log_probs, n_accept)

    keys = jax.random.split(key, num_steps)
    _, (chain, log_probs, n_accepts) = jax.lax.scan(step, state, keys)
    acceptance_rate = jnp.sum(n_accepts) / (num_steps * W)
    return chain, log_probs, acceptance_rate


def autocorrelation_time(chain_1d: jnp.ndarray, c: float = 5.0) -> float:
    """Integrated autocorrelation time of one scalar chain
    (Sokal's adaptive windowing, as used by emcee's diagnostics)."""
    import numpy as np

    x = np.asarray(chain_1d, dtype=np.float64)
    x = x - x.mean()
    n = len(x)
    f = np.fft.fft(x, n=2 * n)
    acf = np.fft.ifft(f * np.conj(f))[:n].real
    acf /= acf[0]
    taus = 2.0 * np.cumsum(acf) - 1.0
    window = np.arange(n) < c * taus
    if window.all():
        return float(taus[-1])
    m = np.argmin(window)
    return float(taus[m])
