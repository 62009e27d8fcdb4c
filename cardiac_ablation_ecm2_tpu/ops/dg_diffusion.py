"""DG diffusion (symmetric interior penalty) — the ex14 capability.

Reference analog: ``DGDiffusionIntegrator`` (``fem/bilininteg.hpp``) with PA
kernels ``fem/integ/bilininteg_dgdiffusion_pa.cpp``; driven as in
``examples/ex14.cpp`` (SIPG: sigma = -1 symmetric).

Bilinear form on a (discontinuous) L2 space:

  a(u,v) = Σ_K ∫ κ∇u·∇v
         − Σ_F ∮ {κ∇u·n}[v] − Σ_F ∮ {κ∇v·n}[u] + Σ_F (α κ/h) ∮ [u][v]

with Dirichlet data imposed weakly through the boundary-face terms
(DGDirichletLFIntegrator analog provides the matching RHS).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..fem.build import basis_for, geom_factors_for
from ..fem.faces import build_face_data
from ..fem.fespace import L2FESpace
from ..utils.config import index_t, real_t
from . import diffusion as dmod
from .operators import LinearOperator


@dataclasses.dataclass(eq=False)
class DGDiffusion:
    """Matrix-free SIPG operator + weak-Dirichlet RHS builder."""

    fes: L2FESpace
    kappa: float = 1.0
    penalty: float = 10.0          # α, scaled by p(p+1) internally
    nq1d: Optional[int] = None
    dtype: object = None

    def __post_init__(self):
        fes, mesh = self.fes, self.fes.mesh
        rt = real_t(self.dtype)
        p = fes.order
        self.db = basis_for(fes, self.nq1d, self.dtype)
        gf = geom_factors_for(fes, self.nq1d, self.dtype)
        self.vol_qd = dmod.setup_packed(gf, self.kappa)

        fd = build_face_data(mesh, p, self.nq1d, with_gradients=True)
        self.e0 = jnp.asarray(fd.elem0, index_t())
        self.e1 = jnp.asarray(fd.elem1, index_t())
        self.B0 = jnp.asarray(fd.B0, rt)
        self.B1 = jnp.asarray(fd.B1, rt)
        # normal derivative matrices: N[f,q,n] = κ ∇φ_n·n at face qpt
        self.N0 = jnp.asarray(
            self.kappa * np.einsum("fqnd,fqd->fqn", fd.G0, fd.normal), rt
        )
        self.N1 = jnp.asarray(
            self.kappa * np.einsum("fqnd,fqd->fqn", fd.G1, fd.normal), rt
        )
        self.w_f = jnp.asarray(fd.wdet, rt)
        alpha = self.penalty * p * (p + 1) if p > 0 else self.penalty
        hmean = 2.0 / (1.0 / fd.h0 + 1.0 / fd.h1)     # harmonic mean
        self.pen = jnp.asarray(
            alpha * self.kappa / hmean, rt
        )                                              # (nfi,)

        self.be = jnp.asarray(fd.b_elem, index_t())
        self.bB = jnp.asarray(fd.b_B, rt)
        self.bN = jnp.asarray(
            self.kappa * np.einsum("fqnd,fqd->fqn", fd.b_G, fd.b_normal), rt
        )
        self.bw = jnp.asarray(fd.b_wdet, rt)
        self.bpen = jnp.asarray(alpha * self.kappa / fd.b_h, rt)   # (nfb,)
        self.b_xq = fd.b_xq
        self.ne = mesh.ne

    # ------------------------------------------------------------------
    def mult(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        ne, nd = self.ne, self.fes.nd_elem
        u = u_flat.reshape(ne, nd)

        # volume κ∇u·∇v
        y = dmod.apply(self.db, self.vol_qd, u)

        # interior faces
        u0 = jnp.einsum("fqn,fn->fq", self.B0, u[self.e0])
        u1 = jnp.einsum("fqn,fn->fq", self.B1, u[self.e1])
        du0 = jnp.einsum("fqn,fn->fq", self.N0, u[self.e0])
        du1 = jnp.einsum("fqn,fn->fq", self.N1, u[self.e1])
        jump = u0 - u1
        avg_flux = 0.5 * (du0 + du1)
        # consistency: −∮ {κ∇u·n}[v]
        t = self.w_f * avg_flux
        y = y.at[self.e0].add(-jnp.einsum("fqn,fq->fn", self.B0, t))
        y = y.at[self.e1].add(jnp.einsum("fqn,fq->fn", self.B1, t))
        # symmetry: −∮ {κ∇v·n}[u]
        s = 0.5 * self.w_f * jump
        y = y.at[self.e0].add(-jnp.einsum("fqn,fq->fn", self.N0, s))
        y = y.at[self.e1].add(-jnp.einsum("fqn,fq->fn", self.N1, s))
        # penalty: (ακ/h) ∮ [u][v]
        pw = self.pen[:, None] * self.w_f * jump
        y = y.at[self.e0].add(jnp.einsum("fqn,fq->fn", self.B0, pw))
        y = y.at[self.e1].add(-jnp.einsum("fqn,fq->fn", self.B1, pw))

        # boundary faces (weak Dirichlet: u⁺ ≡ 0 in the operator)
        ub = jnp.einsum("fqn,fn->fq", self.bB, u[self.be])
        dub = jnp.einsum("fqn,fn->fq", self.bN, u[self.be])
        y = y.at[self.be].add(
            -jnp.einsum("fqn,fq->fn", self.bB, self.bw * dub)
            - jnp.einsum("fqn,fq->fn", self.bN, self.bw * ub)
            + jnp.einsum(
                "fqn,fq->fn", self.bB, self.bpen[:, None] * self.bw * ub
            )
        )
        return y.reshape(-1)

    def dirichlet_rhs(self, g: Callable) -> jnp.ndarray:
        """Weak Dirichlet RHS: −∮ κ∇v·n g + (ακ/h)∮ v g
        (DGDirichletLFIntegrator, fem/lininteg.hpp:573)."""
        gq = jnp.asarray(g(self.b_xq), self.bw.dtype)    # (nfb, nq_f)
        b = (
            -jnp.einsum("fqn,fq->fn", self.bN, self.bw * gq)
            + jnp.einsum(
                "fqn,fq->fn", self.bB, self.bpen[:, None] * self.bw * gq
            )
        )
        ne, nd = self.ne, self.fes.nd_elem
        out = jnp.zeros((ne, nd), dtype=self.bw.dtype)
        out = out.at[self.be].add(b)
        return out.reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        """Jacobi diagonal (volume + penalty terms; consistency terms'
        diagonal contribution included for the owned sides)."""
        d = dmod.diagonal(self.db, self.vol_qd)          # (ne, nd)
        def face_diag(B, N, w, pen, eidx, sign):
            dd = (
                pen[:, None, None] * w[:, :, None] * B * B
                - 2.0 * sign * 0.5 * w[:, :, None] * B * N
            )
            return eidx, jnp.sum(dd, axis=1)
        i0, d0 = face_diag(self.B0, self.N0, self.w_f, self.pen, self.e0, 1.0)
        i1, d1 = face_diag(self.B1, self.N1, self.w_f, self.pen, self.e1, -1.0)
        d = d.at[i0].add(d0)
        d = d.at[i1].add(d1)
        db_ = (
            self.bpen[:, None, None] * self.bw[:, :, None] * self.bB * self.bB
            - 2.0 * self.bw[:, :, None] * self.bB * self.bN
        )
        d = d.at[self.be].add(jnp.sum(db_, axis=1))
        return d.reshape(-1)

    def operator(self) -> LinearOperator:
        n = self.fes.ndof
        return LinearOperator((n, n), self.mult, self.diagonal)


@dataclasses.dataclass(eq=False)
class DGDiffusionBR2(DGDiffusion):
    """BR2 (Bassi–Rebay 2) stabilized DG diffusion.

    Reference analog: ``DGDiffusionBR2Integrator`` (``fem/bilininteg.hpp``).
    Replaces the SIPG penalty (ακ/h)∮[u][v] by the lifted term
    η Σ_F ∫ r_F([u])·r_F([v]) with the per-face lifting
    ∫ r·τ = −∮_F [u]{τ·n}; matrix-free as
    η b(v)ᵀ M⁻¹ b(u) with per-element mass inverses (batched).
    Coercivity needs η > max faces per element; default η = nfaces + 1.
    """

    eta: Optional[float] = None

    def __post_init__(self):
        super().__post_init__()
        fes, mesh = self.fes, self.fes.mesh
        rt = real_t(self.dtype)
        from ..fem.geometry import FACES
        if self.eta is None:
            self.eta = float(len(FACES[mesh.geom]) + 1)

        # batched element mass inverses (DGMassInverse analog)
        from . import mass as _mmod
        gf = geom_factors_for(fes, self.nq1d, self.dtype)
        d2q = fes.d2q if self.nq1d is None else fes.dof_to_quad(self.nq1d)
        B = d2q.full_B()
        qd = np.asarray(_mmod.setup(gf))
        Me = np.einsum("qm,eq,qn->emn", B, qd, B)
        self.Minv = jnp.asarray(np.linalg.inv(Me), rt)

        fd = build_face_data(mesh, fes.order, self.nq1d, with_gradients=True)
        self.nrm = jnp.asarray(fd.normal, rt)            # (nfi, nqf, sdim)
        self.bnrm = jnp.asarray(fd.b_normal, rt)

        # SIPG penalty arrays are reused only by the (approximate) Jacobi
        # diagonal; keep them at the BR2-equivalent strength
        self.pen = jnp.asarray(
            self.eta * self.kappa
            / (2.0 / (1.0 / np.asarray(fd.h0) + 1.0 / np.asarray(fd.h1))),
            rt,
        )
        self.bpen = jnp.asarray(self.eta * self.kappa / fd.b_h, rt)

    def _lift_apply(self, jump, B0, B1, e0, e1, w, nrm, half):
        """y-contribution of η b(v)ᵀ M⁻¹ b(u) for one face batch.

        jump (nf, nq); returns per-side scatter values (nf, nq) to be
        contracted with B0/B1 (sign + for side0, − for side1)."""
        fac = -0.5 if half else -1.0
        wj = w * jump                                     # (nf, nq)
        rhs0 = fac * jnp.einsum("fqn,fq,fqs->fns", B0, wj, nrm)
        t0 = jnp.einsum("fmn,fns->fms", self.Minv[e0], rhs0)
        tn0 = jnp.einsum("fqn,fns,fqs->fq", B0, t0, nrm)
        tn = tn0
        if B1 is not None:
            rhs1 = fac * jnp.einsum("fqn,fq,fqs->fns", B1, wj, nrm)
            t1 = jnp.einsum("fmn,fns->fms", self.Minv[e1], rhs1)
            tn = tn + jnp.einsum("fqn,fns,fqs->fq", B1, t1, nrm)
        return self.eta * self.kappa * fac * w * tn       # (nf, nq)

    def mult(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        ne, nd = self.ne, self.fes.nd_elem
        u = u_flat.reshape(ne, nd)
        y = dmod.apply(self.db, self.vol_qd, u)

        u0 = jnp.einsum("fqn,fn->fq", self.B0, u[self.e0])
        u1 = jnp.einsum("fqn,fn->fq", self.B1, u[self.e1])
        du0 = jnp.einsum("fqn,fn->fq", self.N0, u[self.e0])
        du1 = jnp.einsum("fqn,fn->fq", self.N1, u[self.e1])
        jump = u0 - u1
        t = self.w_f * 0.5 * (du0 + du1)
        y = y.at[self.e0].add(-jnp.einsum("fqn,fq->fn", self.B0, t))
        y = y.at[self.e1].add(jnp.einsum("fqn,fq->fn", self.B1, t))
        s = 0.5 * self.w_f * jump
        y = y.at[self.e0].add(-jnp.einsum("fqn,fq->fn", self.N0, s))
        y = y.at[self.e1].add(-jnp.einsum("fqn,fq->fn", self.N1, s))
        # BR2 stabilization
        z = self._lift_apply(jump, self.B0, self.B1, self.e0, self.e1,
                             self.w_f, self.nrm, half=True)
        y = y.at[self.e0].add(jnp.einsum("fqn,fq->fn", self.B0, z))
        y = y.at[self.e1].add(-jnp.einsum("fqn,fq->fn", self.B1, z))

        # boundary (weak Dirichlet, u⁺ ≡ 0)
        ub = jnp.einsum("fqn,fn->fq", self.bB, u[self.be])
        dub = jnp.einsum("fqn,fn->fq", self.bN, u[self.be])
        zb = self._lift_apply(ub, self.bB, None, self.be, None,
                              self.bw, self.bnrm, half=False)
        y = y.at[self.be].add(
            -jnp.einsum("fqn,fq->fn", self.bB, self.bw * dub)
            - jnp.einsum("fqn,fq->fn", self.bN, self.bw * ub)
            + jnp.einsum("fqn,fq->fn", self.bB, zb)
        )
        return y.reshape(-1)

    def dirichlet_rhs(self, g: Callable) -> jnp.ndarray:
        """Weak Dirichlet RHS: −∮ κ∇v·n g + η b(v)ᵀM⁻¹b(g)."""
        gq = jnp.asarray(g(self.b_xq), self.bw.dtype)
        zg = self._lift_apply(gq, self.bB, None, self.be, None,
                              self.bw, self.bnrm, half=False)
        b = (
            -jnp.einsum("fqn,fq->fn", self.bN, self.bw * gq)
            + jnp.einsum("fqn,fq->fn", self.bB, zg)
        )
        ne, nd = self.ne, self.fes.nd_elem
        out = jnp.zeros((ne, nd), dtype=self.bw.dtype)
        out = out.at[self.be].add(b)
        return out.reshape(-1)
