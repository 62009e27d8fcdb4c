"""Obstacle problem solver: primal–dual active set (semismooth Newton).

Reference analog: ``examples/ex36.cpp`` (obstacle problem via proximal
Galerkin).  Here the classical PDAS iteration, which is a semismooth
Newton method on the complementarity system

    min ½ uᵀA u − bᵀu   s.t.  u ≥ ψ
    ⇔  A u − b − λ = 0,   λ ≥ 0,  u ≥ ψ,  λᵀ(u − ψ) = 0.

Each outer iteration freezes the active set {λ + c(ψ − u) > 0} and solves
one masked SPD system (the same essential-elimination pattern as Dirichlet
BCs — entirely matrix-free, inner CG on device); active sets typically
settle in a handful of iterations."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .solvers import cg


def obstacle_solve(
    Amult: Callable,
    b: jnp.ndarray,
    psi: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    fixed_mask: Optional[jnp.ndarray] = None,
    fixed_vals: Optional[jnp.ndarray] = None,
    c: float = 1e6,
    max_outer: int = 40,
    rel_tol: float = 1e-11,
    max_iter: int = 3000,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Returns (u, λ, outer_iterations).

    ``fixed_mask`` — 1 on Dirichlet dofs with values ``fixed_vals``
    (treated as permanently constrained)."""
    n = b.shape[0]
    fm = jnp.zeros(n) if fixed_mask is None else jnp.asarray(fixed_mask)
    fv = jnp.zeros(n) if fixed_vals is None else jnp.asarray(fixed_vals)
    u = jnp.maximum(fv * fm, psi)
    lam = jnp.zeros(n)
    active_prev = None
    d = diag if diag is not None else jnp.ones(n)

    for it in range(max_outer):
        active = ((lam + c * (psi - u) > 0) & (fm == 0))
        afloat = active.astype(b.dtype)
        con = jnp.maximum(afloat, fm)          # all constrained dofs
        vals = psi * afloat + fv * fm
        free = 1.0 - con

        def A_c(v):
            z = v * free
            return Amult(z) * free + (v - z)

        rhs = (b - Amult(vals * con)) * free + vals * con
        dg = d * free + (1.0 - free)
        u, info = cg(A_c, rhs, M=lambda r: r / dg, rel_tol=rel_tol,
                     max_iter=max_iter)
        lam = (Amult(u) - b) * afloat
        akey = np.asarray(active)
        if active_prev is not None and np.array_equal(akey, active_prev):
            return u, lam, it + 1
        active_prev = akey
    return u, lam, max_outer
