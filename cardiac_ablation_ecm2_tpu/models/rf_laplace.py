"""Electrostatic RF potential solve and SAR (Joule) heating.

Reference analog: ``miniapps/electromagnetics/volta.cpp`` (electrostatics
``∇·(σ∇Φ) = 0``, volta.cpp:16-28) and the Joule-heating pipeline of
``miniapps/electromagnetics/joule.cpp`` (SURVEY.md Appendix B).

For RF ablation the quasi-static potential satisfies ∇·(σ∇Φ)=0 with
Φ = V₀ on the electrode surface and Φ = 0 on the dispersive (ground) pad;
the volumetric heat source is SAR·ρ = σ|∇Φ|² [W/m³].
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..fem.build import geom_factors_for
from ..fem.coefficient import eval_coeff
from ..fem.fespace import FESpace
from ..fem.gridfunction import phys_grad_at_quad
from ..linalg.smoothers import jacobi
from ..linalg.solvers import cg
from ..ops.bilinearform import BilinearForm
from ..ops.operators import form_linear_system
from ..utils.config import real_t


@dataclasses.dataclass
class RFResult:
    fes: FESpace
    phi: jnp.ndarray          # potential L-vector
    sar_q: jnp.ndarray        # σ|∇Φ|² at quadrature points (ne, nq)
    iterations: int
    converged: bool


def solve(
    mesh,
    order: int = 2,
    sigma: object = 0.54,            # myocardium electrical conductivity [S/m]
    electrode_bdr: Sequence[int] = (1,),
    ground_bdr: Sequence[int] = (2,),
    voltage: float = 30.0,
    rel_tol: float = 1e-12,
    max_iter: int = 2000,
    dtype=None,
    fes=None,
) -> RFResult:
    """Solve ∇·(σ∇Φ)=0, Φ=V₀ on electrode, Φ=0 on ground; return Φ and SAR.

    ``fes`` may be a prebuilt space (e.g. CartesianFESpace for the structured
    fast path); default builds a generic FESpace."""
    if fes is None:
        fes = FESpace(mesh, order)
    a = BilinearForm(fes).add_domain_integrator("diffusion", sigma)
    A = a.assemble(dtype).operator()

    ess_e = fes.essential_dofs(electrode_bdr)
    ess_g = fes.essential_dofs(ground_bdr)
    ess = np.unique(np.concatenate([ess_e, ess_g]))
    x0 = jnp.zeros(fes.ndof, dtype=real_t(dtype))
    x0 = x0.at[jnp.asarray(ess_e)].set(voltage)

    b = jnp.zeros(fes.ndof, dtype=real_t(dtype))
    Ac, B = form_linear_system(A, ess, x0, b)
    M = jacobi(Ac.diagonal())
    phi, info = cg(Ac.mult, B, x0=x0, M=M, rel_tol=rel_tol, max_iter=max_iter)

    sar_q = sar(fes, phi, sigma, dtype)
    return RFResult(
        fes=fes, phi=phi, sar_q=sar_q,
        iterations=int(info.iterations), converged=bool(info.converged),
    )


def sar(fes, phi, sigma=1.0, dtype=None) -> jnp.ndarray:
    """Joule heating density σ|∇Φ|² at quadrature points → (ne, nq)."""
    g = phys_grad_at_quad(fes, phi, dtype=dtype)
    gf = geom_factors_for(fes, dtype=dtype)
    sq = eval_coeff(sigma, gf, dtype)
    e2 = jnp.sum(g * g, axis=-1)
    return e2 if sq is None else sq * e2


def total_power(fes, sar_q, dtype=None) -> jnp.ndarray:
    """∫ σ|∇Φ|² dΩ — delivered RF power [W]."""
    gf = geom_factors_for(fes, dtype=dtype)
    return jnp.sum(gf.wdet * sar_q)
