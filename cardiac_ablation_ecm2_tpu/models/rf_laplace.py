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

import jax
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


@dataclasses.dataclass(eq=False)
class RFOperator:
    """Re-solvable electrostatic operator for temperature-coupled σ(T).

    Reference analog: ``joule.cpp`` re-solves the electric field each step
    with temperature-dependent conductivity (``joule_solver.hpp:107``,
    ``miniapps/electromagnetics/joule_solver.cpp`` ``ElectricLosses`` /
    ``GetJouleHeating``).  Here the potential solve is one jitted function of
    the conductivity Q-vector, warm-started from the previous potential.
    """

    fes: FESpace
    electrode_bdr: Sequence[int] = (1,)
    ground_bdr: Sequence[int] = (2,)
    voltage: float = 30.0
    rel_tol: float = 1e-10
    max_iter: int = 2000
    dtype: object = None

    def __post_init__(self):
        from ..fem.build import basis_for, restriction_for
        from ..fem.geom_factors import adjugate
        from ..fem.quadinterp import eval_grad
        from ..ops import diffusion
        from ..utils.config import index_t

        fes = self.fes
        gf = geom_factors_for(fes, dtype=self.dtype)
        restr = restriction_for(fes)
        db = basis_for(fes, dtype=self.dtype)

        ess_e = fes.essential_dofs(self.electrode_bdr)
        ess_g = fes.essential_dofs(self.ground_bdr)
        ess = jnp.asarray(
            np.unique(np.concatenate([ess_e, ess_g])), dtype=index_t()
        )
        x_bc = jnp.zeros(fes.ndof, dtype=real_t(self.dtype))
        x_bc = x_bc.at[jnp.asarray(ess_e)].set(self.voltage)
        m = np.ones(fes.ndof, dtype=np.float64)
        m[np.asarray(np.unique(np.concatenate([ess_e, ess_g])))] = 0.0
        emask = jnp.asarray(m, real_t(self.dtype))
        rel_tol, max_iter = self.rel_tol, self.max_iter

        def resolve(sigma_q, phi0):
            """(σ at quad points, warm start) → (Φ, σ|∇Φ|² Q-vector)."""
            qd = diffusion.setup_packed(gf, sigma_q)

            def raw(v):
                return restr.mult_transpose(
                    diffusion.apply(db, qd, restr.mult(v))
                )

            def lhs(v):
                z = v * emask
                return raw(z) * emask + (v - z)

            # eliminate BC values into the RHS (FormLinearSystem analog)
            b = (-raw(x_bc)) * emask + x_bc * (1.0 - emask)
            diag = restr.mult_transpose(diffusion.diagonal(db, qd))
            diag = diag * emask + (1.0 - emask)
            inv = 1.0 / diag
            phi0 = phi0 * emask + x_bc * (1.0 - emask)
            phi, info = cg(lhs, b, x0=phi0, M=lambda r: inv * r,
                           rel_tol=rel_tol, max_iter=max_iter)
            # SAR = σ|∇Φ|² at quadrature points
            g = eval_grad(db, restr.mult(phi))         # reference grads
            A = adjugate(gf.jac)
            gx = jnp.einsum("eqab,eqa->eqb", A, g) / gf.det[..., None]
            sar_q = sigma_q * jnp.sum(gx * gx, axis=-1)
            return phi, sar_q, info

        self.gf = gf
        self.resolve = jax.jit(resolve)
        self.phi0 = x_bc

    def sigma_of_T_q(self, sigma_fn, T) -> jnp.ndarray:
        """Evaluate σ(T) at quadrature points from a nodal T."""
        Tq = _values_at_quad(self.fes, T, dtype=self.dtype)
        return sigma_fn(Tq)


def _values_at_quad(fes, u, dtype=None):
    from ..fem.gridfunction import values_at_quad

    return values_at_quad(fes, u, dtype=dtype)


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
