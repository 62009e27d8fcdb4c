"""Transient incompressible Navier-Stokes: BDF/EXT split-step solver.

Reference analog: the **Navier** miniapp (``miniapps/fluids/navier/
navier_solver.hpp:98-141,183``) — high-order split scheme with extrapolated
nonlinear terms, a pressure Poisson solve, and a Helmholtz velocity solve.
This implementation uses the incremental pressure-correction variant with
the rotational term (Guermond-Minev-Shen family):

  1. u* : (bd0/dt·M + ν K) u* = −M Σᵢ bdᵢ uⁿ⁻ⁱ/dt − (N_ext, v)
          − (∇pⁿ, v) + (f, v),   u* = g on Γ_D
  2. φ  : (∇φ, ∇q) = −bd0/dt (∇·u*, q)        (Neumann, mean-zero)
  3. p  : pⁿ⁺¹ = pⁿ + φ − ν·Π_p(∇·u*)          (rotational correction)
  4. u  : M uⁿ⁺¹ = M u* − dt/bd0 (∇φ, v)       (projection)

with N(u) = (u·∇)u extrapolated (EXTk) and BDFk time derivatives, k
ramping 1→2.  Equal-order H1 velocity/pressure (the reference's choice).
All four sub-solves are Jacobi-PCG inside one jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.build import basis_for, geom_factors_for, restriction_for
from ..fem.fespace import FESpace
from ..fem.geom_factors import adjugate
from ..fem.quadinterp import eval_grad, eval_values, eval_values_t
from ..linalg.solvers import cg
from ..ops import diffusion as dmod
from ..ops import mass as mmod
from ..utils.config import index_t, real_t


@dataclasses.dataclass(eq=False)
class NavierSolver:
    mesh: object
    order: int = 3
    kin_vis: float = 1.0
    vel_bc: Optional[Callable] = None     # g(x) -> (..., dim) Dirichlet
    vel_bdr: Optional[Sequence[int]] = None   # None = all attributes
    forcing: Optional[Callable] = None    # f(x) -> (..., dim)
    rel_tol: float = 1e-10
    max_iter: int = 2000
    dtype: object = None

    def __post_init__(self):
        mesh = self.mesh
        dim = mesh.dim
        rt = real_t(self.dtype)
        self.dim = dim
        self.vfes = FESpace(mesh, self.order, vdim=dim)
        self.pfes = FESpace(mesh, self.order)
        fes = self.pfes                     # scalar structure shared
        self.restr = restriction_for(fes)
        self.db = basis_for(fes, dtype=self.dtype)
        self.gf = geom_factors_for(fes, dtype=self.dtype)
        gf = self.gf
        self.A_adj = adjugate(gf.jac)                     # (ne,nq,d,d)
        self.inv_det = 1.0 / gf.det

        # qdata for scalar mass/diffusion building blocks
        self.qmass = mmod.setup(gf)                       # w·detJ
        self.qdiff = dmod.setup_packed(gf, self.kin_vis)  # ν-scaled
        self.qdiff1 = dmod.setup_packed(gf, 1.0)          # pressure Poisson

        ns = fes.ndof_scalar
        self.ns = ns
        # diagonals
        self.dM = self.restr.mult_transpose(mmod.diagonal(self.db, self.qmass))
        self.dK = self.restr.mult_transpose(
            dmod.diagonal(self.db, self.qdiff))
        self.dKp = self.restr.mult_transpose(
            dmod.diagonal(self.db, self.qdiff1))

        # velocity Dirichlet dofs (all components)
        ess_s = fes.essential_dofs(self.vel_bdr)
        self.ess_s = jnp.asarray(ess_s, index_t())
        self.has_ess = len(ess_s) > 0
        m = np.ones(ns, dtype=np.float64)
        m[np.asarray(ess_s)] = 0.0
        self.ess_mask = jnp.asarray(m, rt)[None, :]       # (1, ns)
        if self.vel_bc is not None:
            gvals = np.asarray(self.vel_bc(fes.dof_coords), dtype=float)
            self.u_bc = jnp.asarray(gvals.T.copy(), rt)   # (d, ns)
        else:
            self.u_bc = jnp.zeros((dim, ns), rt)

        # lumped weights for the pressure mean (mean-zero Neumann solve)
        ones_q = jnp.ones_like(gf.det)
        self.wlump = self.restr.mult_transpose(
            eval_values_t(self.db, self.qmass * ones_q))
        self.wsum = jnp.sum(self.wlump)

        # forcing linear form (steady)
        if self.forcing is not None:
            fq = jnp.asarray(self.forcing(np.asarray(gf.x)), rt)
            self.b_f = self._vector_lf(fq)
        else:
            self.b_f = jnp.zeros((dim, ns), rt)

        self._steps = {}

    # -- building blocks (all jit-safe) ---------------------------------
    def _e(self, u_comp):
        """(ns, c) L-vector → E-vector (ne, nd, c)."""
        return self.restr.mult(u_comp)

    def _vals(self, u_dn):
        """(d, ns) → values at quad (ne, nq, d)."""
        return eval_values(self.db, self._e(u_dn.T))

    def _phys_grad(self, u_dn):
        """(d, ns) → ∂_b u_c at quad (ne, nq, b, c)."""
        g = eval_grad(self.db, self._e(u_dn.T))           # (ne,nq,a,c)
        return jnp.einsum("eqab,eqac->eqbc", self.A_adj, g) \
            * self.inv_det[..., None, None]

    def _scalar_grad(self, p):
        g = eval_grad(self.db, self._e(p))                # (ne,nq,a)
        return jnp.einsum("eqab,eqa->eqb", self.A_adj, g) \
            * self.inv_det[..., None]

    def _vector_lf(self, vq):
        """(c, φ v): (ne, nq, d) → (d, ns) assembled linear form."""
        y = eval_values_t(self.db, self.qmass[..., None] * vq)  # (ne,nd,d)
        return self.restr.mult_transpose(y).T

    def _scalar_lf(self, q):
        return self.restr.mult_transpose(
            eval_values_t(self.db, self.qmass * q))

    def _mass_apply(self, u_dn):
        e = self._e(u_dn.T)
        return self.restr.mult_transpose(
            mmod.apply(self.db, self.qmass, e)).T

    def _stiff_apply(self, u_dn):
        e = self._e(u_dn.T)
        return self.restr.mult_transpose(
            dmod.apply(self.db, self.qdiff, e)).T

    def _zero_ess(self, u_dn):
        if self.has_ess:
            return u_dn * self.ess_mask
        return u_dn

    # -- one time step ---------------------------------------------------
    def _make_step(self, dt, k):
        """Jitted step for BDFk/EXTk (k ∈ {1, 2})."""
        if k == 1:
            bd = (1.0, -1.0)
            ab = (1.0, 0.0)
        else:
            bd = (1.5, -2.0, 0.5)
            ab = (2.0, -1.0)
        nu = self.kin_vis
        bd0dt = bd[0] / dt

        def conv_lf(u_dn):
            uq = self._vals(u_dn)
            gq = self._phys_grad(u_dn)
            Nq = jnp.einsum("eqj,eqjc->eqc", uq, gq)
            return self._vector_lf(Nq)

        def step(hist, p, u_bc, b_f):
            # hist: tuple of (d, ns) velocities, newest first
            rhs = b_f - sum(
                ab[i] * conv_lf(hist[i]) for i in range(len(ab)) if ab[i]
            )
            rhs = rhs - self._mass_apply(
                sum((bd[i + 1] / dt) * hist[i] for i in range(len(bd) - 1))
            )
            gp = self._scalar_grad(p)
            rhs = rhs - self._vector_lf(gp)

            # Helmholtz solve for u*
            def H(v):
                v = v.reshape(self.dim, self.ns)
                z = self._zero_ess(v)
                y = bd0dt * self._mass_apply(z) + self._stiff_apply(z)
                y = self._zero_ess(y)
                return (y + (v - z)).reshape(-1)

            dg = bd0dt * self.dM + self.dK
            dgv = jnp.tile(dg[None], (self.dim, 1))
            if self.has_ess:
                dgv = dgv * self.ess_mask + (1.0 - self.ess_mask)
            B = self._zero_ess(rhs - (bd0dt * self._mass_apply(u_bc)
                                      + self._stiff_apply(u_bc)))
            x0 = jnp.zeros_like(B)
            inv = 1.0 / dgv.reshape(-1)
            ustar_h, _ = cg(H, B.reshape(-1), x0=x0.reshape(-1),
                            M=lambda r: inv * r,
                            rel_tol=self.rel_tol, max_iter=self.max_iter)
            ustar = ustar_h.reshape(self.dim, self.ns) + u_bc

            # pressure increment: (∇φ, ∇q) = −bd0/dt (∇·u*, q), mean-zero
            gq = self._phys_grad(ustar)
            divq = jnp.einsum("eqcc->eq", gq)
            bphi = -bd0dt * self._scalar_lf(divq)
            bphi = bphi - (jnp.sum(bphi) / self.wsum) * self.wlump

            def Kp(v):
                e = self._e(v)
                return self.restr.mult_transpose(
                    dmod.apply(self.db, self.qdiff1, e))

            invp = 1.0 / jnp.where(self.dKp == 0, 1.0, self.dKp)
            phi, _ = cg(Kp, bphi, M=lambda r: invp * r,
                        rel_tol=self.rel_tol, max_iter=self.max_iter)
            phi = phi - jnp.sum(self.wlump * phi) / self.wsum

            # rotational pressure correction: Π_p(ν ∇·u*)
            bdiv = self._scalar_lf(nu * divq)

            def Mp(v):
                e = self._e(v)
                return self.restr.mult_transpose(
                    mmod.apply(self.db, self.qmass, e))

            invm = 1.0 / self.dM
            pdiv, _ = cg(Mp, bdiv, M=lambda r: invm * r,
                         rel_tol=self.rel_tol, max_iter=self.max_iter)
            p_new = p + phi - pdiv

            # velocity projection: M u = M u* − dt/bd0 (∇φ, v)
            gphi = self._scalar_grad(phi)
            bu = self._mass_apply(ustar) - (1.0 / bd0dt) * self._vector_lf(
                gphi)

            def Mv(v):
                return self._mass_apply(v.reshape(self.dim, self.ns)
                                        ).reshape(-1)

            invv = jnp.tile(invm[None], (self.dim, 1)).reshape(-1)
            u_new, _ = cg(Mv, bu.reshape(-1), x0=ustar.reshape(-1),
                          M=lambda r: invv * r,
                          rel_tol=self.rel_tol, max_iter=self.max_iter)
            u_new = u_new.reshape(self.dim, self.ns)
            if self.has_ess:
                u_new = (u_new * self.ess_mask
                         + u_bc * (1.0 - self.ess_mask))
            return u_new, p_new

        return jax.jit(step)

    # -- public API -------------------------------------------------------
    def initial_state(self, u0: Optional[Callable] = None):
        rt = real_t(self.dtype)
        if u0 is None:
            u = jnp.zeros((self.dim, self.ns), rt)
        else:
            u = jnp.asarray(
                np.asarray(u0(self.pfes.dof_coords), dtype=float).T, rt)
        p = jnp.zeros(self.ns, rt)
        return u, p

    def run(self, dt: float, nsteps: int, u0: Optional[Callable] = None,
            vel_bc_t: Optional[Callable] = None,
            forcing_t: Optional[Callable] = None, t0: float = 0.0):
        """``vel_bc_t(x, t)`` / ``forcing_t(x, t)``: optional time-dependent
        Dirichlet data / body force, evaluated at each step's END time (the
        implicit side of the split scheme — miniapps/fluids convention);
        they enable manufactured-solution temporal-convergence tests
        (e.g. the decaying Taylor-Green vortex)."""
        rt = real_t(self.dtype)
        u, p = self.initial_state(u0)
        s1 = self._make_step(dt, 1)
        s2 = self._make_step(dt, 2)

        def bc_at(t):
            if vel_bc_t is None:
                return self.u_bc
            g = np.asarray(vel_bc_t(self.pfes.dof_coords, t), dtype=float)
            return jnp.asarray(g.T.copy(), rt)

        def f_at(t):
            if forcing_t is None:
                return self.b_f
            fq = jnp.asarray(
                np.asarray(forcing_t(np.asarray(self.gf.x), t)), rt)
            return self._vector_lf(fq)

        t = t0 + dt
        u_prev = u
        u_new, p = s1((u,), p, bc_at(t), f_at(t))
        u, u_prev = u_new, u
        for _ in range(nsteps - 1):
            t = t + dt
            u_new, p = s2((u, u_prev), p, bc_at(t), f_at(t))
            u, u_prev = u_new, u
        return u, p

    # -- diagnostics ------------------------------------------------------
    def velocity_error(self, u, exact: Callable) -> float:
        uq = self._vals(u)
        xe = np.asarray(self.gf.x)
        eq = jnp.asarray(np.asarray(exact(xe), dtype=float))
        d2 = jnp.sum((uq - eq) ** 2, axis=-1)
        return float(jnp.sqrt(jnp.sum(self.gf.wdet * d2)))

    def div_norm(self, u) -> float:
        gq = self._phys_grad(u)
        divq = jnp.einsum("eqcc->eq", gq)
        return float(jnp.sqrt(jnp.sum(self.gf.wdet * divq ** 2)))
