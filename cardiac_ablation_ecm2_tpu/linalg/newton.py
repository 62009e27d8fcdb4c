"""Newton's method with matrix-free Jacobians.

Reference analog: ``NewtonSolver`` (``linalg/solvers.hpp:780``) driving
``Operator::GetGradient`` — where the reference hand-codes per-integrator
gradient assembly (``NonlinearForm::GetGradient``), the TPU build gets the
exact Jacobian action for free via ``jax.linearize`` on the residual.  This
replaces the entire AD subsystem of the reference (dFEM/Enzyme/dual numbers,
SURVEY.md §2.4) — JAX *is* the AD framework.

Inner linear solves are CG (SPD Jacobians) or GMRES, inexact-Newton style
with a fixed inner tolerance; globalization is a simple backtracking line
search on ‖F‖ (the reference's default Newton has none; ``SetAdaptiveLinRtol``
-style forcing terms can be layered later).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .solvers import cg, default_dot, gmres


class NewtonInfo(NamedTuple):
    iterations: jnp.ndarray
    final_norm: jnp.ndarray
    converged: jnp.ndarray


def newton(
    residual: Callable,
    u0: jnp.ndarray,
    rel_tol: float = 1e-10,
    abs_tol: float = 0.0,
    max_iter: int = 20,
    linear_solver: str = "cg",
    linear_rel_tol: float = 1e-8,
    linear_max_iter: int = 500,
    precond: Optional[Callable] = None,   # (u) -> M callable, rebuilt per step
    line_search: int = 0,                  # max halvings (0 = full steps)
    dot: Callable = default_dot,
):
    """Solve residual(u) = 0.  Jit-safe (fixed trace bounds everywhere)."""

    def norm(v):
        return jnp.sqrt(dot(v, v))

    F0 = residual(u0)
    n0 = norm(F0)
    target = jnp.maximum(rel_tol * n0, abs_tol)

    def cond(state):
        u, F, nF, k, done = state
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(state):
        u, F, nF, k, _ = state
        _, jvp = jax.linearize(residual, u)
        M = precond(u) if precond is not None else None
        if linear_solver == "cg":
            du, _info = cg(jvp, -F, M=M, rel_tol=linear_rel_tol,
                           max_iter=linear_max_iter, dot=dot)
        else:
            du, _info = gmres(jvp, -F, M=M, rel_tol=linear_rel_tol,
                              max_iter=linear_max_iter, dot=dot)

        if line_search > 0:
            def ls_body(i, carry):
                alpha, best_u, best_n = carry
                u_try = u + alpha * du
                n_try = norm(residual(u_try))
                better = n_try < best_n
                return (
                    alpha * 0.5,
                    jnp.where(better, u_try, best_u),
                    jnp.where(better, n_try, best_n),
                )

            _, u_new, n_new = lax.fori_loop(
                0, line_search + 1, ls_body, (jnp.ones_like(nF), u, nF)
            )
        else:
            u_new = u + du
            n_new = norm(residual(u_new))
        F_new = residual(u_new)
        done = n_new <= target
        return (u_new, F_new, n_new, k + 1, done)

    u, F, nF, k, done = lax.while_loop(
        cond, body, (u0, F0, n0, jnp.int32(0), n0 <= target)
    )
    return u, NewtonInfo(iterations=k, final_norm=nF, converged=done)
