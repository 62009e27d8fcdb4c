"""Spectral fractional Laplacian (−Δ)^s via sinc-quadrature rational sums.

Reference analog: ``examples/ex33.cpp`` — (−Δ)^s u = f solved through a
rational approximation (AAA there); here the Bonito–Pasciak sinc
quadrature of the Balakrishnan integral,

    A^{-s} = (sin πs / π) ∫₀^∞ t^{-s} (tI + A)⁻¹ dt
           ≈ (k sin πs / π) Σ_l e^{(1−s) y_l} (e^{y_l} I + A)⁻¹,

which for the FEM pencil (A, M) becomes a sum of shifted SPD solves
(e^{y_l} M + A)⁻¹ M — each one an ordinary Jacobi-PCG, all matrix-free.
Exponential convergence in the number of quadrature points."""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from .solvers import cg


def sinc_weights(s: float, lam_min: float, lam_max: float,
                 k: float = 0.35) -> Tuple[np.ndarray, np.ndarray]:
    """(shifts t_l, weights w_l) so A_M^{-s} ≈ Σ w_l (t_l M + A)⁻¹ M.

    The y-grid covers the spectral interval with margins (the integrand
    decays like e^{-s y} for y ≫ log λmax and e^{(1-s)y} for
    y ≪ log λmin)."""
    # margins so both exponential tails fall below ~e⁻¹⁴ (the high tail
    # decays like e^{-s y}, the low one like e^{(1-s) y})
    y_lo = np.log(lam_min) - 14.0 / (1.0 - s)
    y_hi = np.log(lam_max) + 14.0 / s
    y = np.arange(y_lo, y_hi + k, k)
    t = np.exp(y)
    w = (k * np.sin(np.pi * s) / np.pi) * np.exp((1.0 - s) * y)
    return t, w


def fractional_apply(
    Amult: Callable,
    Mmult: Callable,
    diagA: jnp.ndarray,
    diagM: jnp.ndarray,
    s: float,
    v: jnp.ndarray,
    lam_min: float,
    lam_max: float,
    k: float = 0.35,
    rel_tol: float = 1e-11,
    max_iter: int = 3000,
) -> jnp.ndarray:
    """u = A_M^{-s} v with A_M = M⁻¹A (both SPD, matrix-free).

    To solve (−Δ)^s u = f weakly (b = (f, φ)), pass v = M⁻¹ b — or use
    :func:`fractional_solve`."""
    import jax
    from jax import lax

    t_np, w_np = sinc_weights(s, lam_min, lam_max, k)

    # one jitted scan over all shifts — the inner CG traces exactly once
    @jax.jit
    def run(Mv, ts, ws):
        def shift_solve(acc, tw):
            t, w = tw
            d = t * diagM + diagA
            x, _ = cg(lambda z: t * Mmult(z) + Amult(z), Mv,
                      M=lambda r: r / d, rel_tol=rel_tol,
                      max_iter=max_iter)
            return acc + w * x, None

        u, _ = lax.scan(shift_solve, jnp.zeros_like(Mv), (ts, ws))
        return u

    return run(Mmult(v), jnp.asarray(t_np, v.dtype),
               jnp.asarray(w_np, v.dtype))


def fractional_solve(Amult, Mmult, diagA, diagM, s, b,
                     lam_min, lam_max, k=0.35, rel_tol=1e-11,
                     max_iter=3000) -> jnp.ndarray:
    """Solve (−Δ)^s u = f from the load vector b = (f, φ):
    u = A_M^{-s} M⁻¹ b = A_M^{(1-s)} A⁻¹ b — computed as
    A_M^{-s} (M⁻¹ b) with one extra mass solve."""
    v, _ = cg(Mmult, b, M=lambda r: r / diagM, rel_tol=rel_tol,
              max_iter=max_iter)
    return fractional_apply(Amult, Mmult, diagA, diagM, s, v,
                            lam_min, lam_max, k, rel_tol, max_iter)
