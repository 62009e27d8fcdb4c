"""Mixed Darcy saddle point — the "ex5" capability slice.

Reference analog: ``examples/ex5.cpp``: RT×L2 block system

    [ M   Bᵀ ] [u]   [f]
    [ B   0  ] [p] = [g]

solved with MINRES and a block-diagonal preconditioner (Jacobi on M, a
lumped-mass Schur surrogate on the p block).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..fem.fespace import L2FESpace
from ..fem.fe_vector import RTSpace
from ..linalg.krylov_extra import minres
from ..ops.block import BlockOperator, block_diag_precond, mixed_divergence
from ..ops.vecfe import build_rt_operator, vecfe_linear_form
from ..utils.config import real_t


@dataclasses.dataclass
class DarcyResult:
    rt: RTSpace
    l2: L2FESpace
    u: jnp.ndarray
    p: jnp.ndarray
    iterations: int
    converged: bool


def solve(mesh, f_vec=None, g_fn=None, rel_tol: float = 1e-10,
          max_iter: int = 5000, dtype=None) -> DarcyResult:
    """Solve M u + Bᵀ p = f, B u = g on RT0 × L2-P0 (natural u·n BCs)."""
    rt_space = RTSpace(mesh)
    l2 = L2FESpace(mesh, 0)
    M = build_rt_operator(rt_space, mass_coeff=1.0, dtype=dtype)
    B, Bt = mixed_divergence(rt_space, l2, dtype=dtype)
    n0, n1 = rt_space.ndof, l2.ndof_scalar
    rtt = real_t(dtype)

    op = BlockOperator(n0=n0, n1=n1, A00=M.mult, A01=Bt, A10=B)

    f = (vecfe_linear_form(M, f_vec) if f_vec is not None
         else jnp.zeros(n0, rtt))
    if g_fn is not None:
        # (g, q) for piecewise-constant q: ∫_K g
        gq = jnp.asarray(g_fn(np.asarray(M.gf.x)), rtt)
        ge = jnp.sum(M.gf.wdet * gq, axis=1)                  # (ne,)
        g = jnp.zeros(n1, rtt).at[
            jnp.asarray(l2.gather_map[:, 0])
        ].add(ge)
    else:
        g = jnp.zeros(n1, rtt)
    # compatibility: project out the constant-pressure nullspace source
    rhs = jnp.concatenate([f, g])

    dM = M.diagonal()
    # Schur surrogate: diag(B diag(M)^-1 Bᵀ) ≈ element volumes scale; use
    # per-element volume as the p-block preconditioner
    vol_e = jnp.sum(M.gf.wdet, axis=1)
    pvec = jnp.zeros(n1, rtt).at[jnp.asarray(l2.gather_map[:, 0])].add(vol_e)

    prec = block_diag_precond(lambda r: r / dM, lambda r: r / pvec, n0)

    x, info = minres(op.mult, rhs, M=prec, rel_tol=rel_tol, max_iter=max_iter)
    u, p = x[:n0], x[n0:]
    # the assembled block uses +Bᵀ/+B, i.e. (u,v) + (p̃, div v) = (f,v) with
    # p̃ = −p of the Darcy form (u + ∇p = f); flip to the physical pressure
    p = -p
    # note: the dropped boundary term weakly imposes p = 0 on ∂Ω, so the
    # pressure is fully determined — no nullspace shift needed
    return DarcyResult(
        rt=rt_space, l2=l2, u=u, p=p,
        iterations=int(info.iterations), converged=bool(info.converged),
    )
