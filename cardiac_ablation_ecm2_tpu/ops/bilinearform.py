"""BilinearForm: the operator-assembly front-end.

Reference analog: ``BilinearForm`` (``fem/bilinearform.hpp:60``) with
``AddDomainIntegrator`` / ``Assemble`` / ``FormLinearSystem`` and the
``AssemblyLevel`` engines (``fem/bilinearform_ext.hpp``):

* **PARTIAL** (the default here, the TPU-native path): precompute qdata per
  integrator, apply matrix-free as R→(sum of integrator applies)→Rᵀ
  (``PABilinearFormExtension::MultInternal``, fem/bilinearform_ext.cpp:487).
* **FULL**: assemble a host-side scipy CSR matrix from batched element
  matrices (``FABilinearFormExtension`` / legacy path) — used by the
  assembly-level cross-check tests (tests/unit/fem/test_assembly_levels.cpp
  analog) and by LOR preconditioning.

Integrators are registered by name; each provides setup/apply/diagonal (see
``ops/mass.py``, ``ops/diffusion.py``, ...).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fem.build import basis_for, geom_factors_for, restriction_for
from ..fem.coefficient import eval_coeff
from ..fem.quadinterp import DeviceBasis
from ..fem.restriction import ElementRestriction
from ..utils.config import real_t
from . import convection, diffusion, mass
from .operators import LinearOperator

_INTEGRATORS = {
    "mass": mass,
    "diffusion": diffusion,
    "convection": convection,
}


def register_integrator(name: str, module) -> None:
    """Extension hook: module must provide setup/apply/diagonal."""
    _INTEGRATORS[name] = module


@dataclasses.dataclass
class _Term:
    kind: str
    coeff: object = None
    vector_coeff: object = None


@dataclasses.dataclass(frozen=True, eq=False)
class PAOperator:
    """Assembled partial-assembly operator: y = Rᵀ (Σ_i apply_i(qdata_i)) R x."""

    restr: ElementRestriction
    db: DeviceBasis
    terms: Tuple[Tuple[object, jnp.ndarray], ...]   # (integ module, qdata)
    ndof: int
    vdim: int = 1

    def mult(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.vdim > 1:
            xl = x.reshape(self.vdim, self.ndof).T       # (ndof, vdim) byNODES
            e = self.restr.mult(xl)                      # (ne, nd, vdim)
        else:
            e = self.restr.mult(x)
        y = None
        for mod, qd in self.terms:
            t = mod.apply(self.db, qd, e)
            y = t if y is None else y + t
        out = self.restr.mult_transpose(y)
        if self.vdim > 1:
            return out.T.reshape(-1)
        return out

    def diagonal(self) -> jnp.ndarray:
        d = None
        for mod, qd in self.terms:
            t = mod.diagonal(self.db, qd)
            d = t if d is None else d + t
        dl = self.restr.mult_transpose(d)
        if self.vdim > 1:
            return jnp.tile(dl, self.vdim)
        return dl

    def operator(self) -> LinearOperator:
        n = self.ndof * self.vdim
        return LinearOperator((n, n), self.mult, self.diagonal)


class BilinearForm:
    """Front-end mirroring the reference API shape (fem/bilinearform.hpp:60)."""

    def __init__(self, fes, nq1d: Optional[int] = None):
        self.fes = fes
        self.nq1d = nq1d
        self._terms: List[_Term] = []

    def add_domain_integrator(self, kind: str, coeff=None, vector_coeff=None):
        if kind not in _INTEGRATORS:
            raise ValueError(
                f"unknown integrator {kind!r}; have {sorted(_INTEGRATORS)}"
            )
        self._terms.append(_Term(kind, coeff, vector_coeff))
        return self

    # ------------------------------------------------------------------
    def assemble(self, dtype=None) -> PAOperator:
        """PARTIAL assembly: build qdata, return the matrix-free operator."""
        fes = self.fes
        gf = geom_factors_for(fes, self.nq1d, dtype)
        db = basis_for(fes, self.nq1d, dtype)
        restr = restriction_for(fes)
        terms = []
        for t in self._terms:
            mod = _INTEGRATORS[t.kind]
            cq = eval_coeff(t.coeff, gf, dtype)
            if t.vector_coeff is not None:
                vq = _eval_vector_coeff(t.vector_coeff, gf, dtype)
                qd = mod.setup(gf, cq, vq)
            else:
                qd = mod.setup(gf, cq)
            terms.append((mod, qd))
        return PAOperator(
            restr=restr, db=db, terms=tuple(terms),
            ndof=fes.ndof_scalar, vdim=fes.vdim,
        )

    # ------------------------------------------------------------------
    def assemble_matrix(self, dtype=None):
        """FULL assembly to scipy CSR (reference LEGACY/FULL levels).

        Builds batched element matrices from the densified basis and the same
        qdata as the PA path, then scatters via the gather map — the
        cross-check harness for PA correctness.
        """
        import scipy.sparse as sp

        fes = self.fes
        gf = geom_factors_for(fes, self.nq1d, dtype)
        d2q = fes.dof_to_quad(self.nq1d)
        B = d2q.full_B()                      # (nq, nd)
        G = d2q.full_G()                      # (nq, nd, dim)
        A_e = None
        for t in self._terms:
            mod = _INTEGRATORS[t.kind]
            cq = eval_coeff(t.coeff, gf, dtype)
            if t.vector_coeff is not None:
                vq = _eval_vector_coeff(t.vector_coeff, gf, dtype)
                qd = np.asarray(mod.setup(gf, cq, vq))
            else:
                qd = np.asarray(mod.setup(gf, cq))
            term = _element_matrices(t.kind, B, G, qd)
            A_e = term if A_e is None else A_e + term
        gm = fes.gather_map.astype(np.int64)
        ne, nd = gm.shape
        rows = np.repeat(gm, nd, axis=1).reshape(-1)
        cols = np.tile(gm, (1, nd)).reshape(-1)
        A = sp.coo_matrix(
            (A_e.reshape(-1), (rows, cols)),
            shape=(fes.ndof_scalar, fes.ndof_scalar),
        ).tocsr()
        if fes.vdim > 1:
            A = sp.block_diag([A] * fes.vdim).tocsr()
        return A


def _element_matrices(kind: str, B, G, qd) -> np.ndarray:
    if kind == "mass":
        return np.einsum("qm,eq,qn->emn", B, qd, B)
    if kind == "diffusion":
        return np.einsum("qma,eqab,qnb->emn", G, qd, G)
    if kind == "convection":
        # qd: (ne, nq, dim) — (v·grad u, w)
        return np.einsum("qm,eqa,qna->emn", B, qd, G)
    raise NotImplementedError(f"element matrices for {kind}")


def _eval_vector_coeff(coeff, gf, dtype=None):
    if callable(coeff):
        return jnp.asarray(coeff(gf.x), dtype=real_t(dtype))
    arr = jnp.asarray(coeff, dtype=real_t(dtype))
    if arr.ndim == 1:  # constant vector
        ne, nq = gf.det.shape
        return jnp.broadcast_to(arr[None, None, :], (ne, nq, arr.shape[0]))
    return arr
