"""Linear elasticity — the "ex2" capability slice.

Reference analog: ``examples/ex2.cpp``: vector H1 space, multi-material
``ElasticityIntegrator`` (λ, μ piecewise by element attribute), fixed
boundary (attribute 1), downward pull force on boundary attribute 2 via
``VectorBoundaryLFIntegrator``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..fem.fespace import FESpace
from ..linalg.smoothers import jacobi
from ..linalg.solvers import cg
from ..ops.bilinearform import BilinearForm
from ..ops.linearform import boundary_lf_vector
from ..ops.operators import form_linear_system
from ..utils.config import real_t


@dataclasses.dataclass
class ElasticityResult:
    fes: FESpace
    u: jnp.ndarray      # (ndof_scalar·vdim,) byNODES displacement
    iterations: int
    converged: bool

    def displacement(self) -> np.ndarray:
        """(ndof_scalar, vdim) per-node displacement."""
        v = np.asarray(self.u).reshape(self.fes.vdim, self.fes.ndof_scalar)
        return v.T


def solve(
    mesh,
    order: int = 1,
    lam: object = 1.0,
    mu: object = 1.0,
    fixed_bdr: Sequence[int] = (1,),
    force_bdr: Sequence[int] = (2,),
    force=None,
    rel_tol: float = 1e-10,
    max_iter: int = 5000,
    dtype=None,
) -> ElasticityResult:
    """Cantilever: −div σ(u) = 0, u=0 on fixed_bdr, σ·n = force on force_bdr."""
    dim = mesh.dim
    fes = FESpace(mesh, order, vdim=dim)
    if force is None:
        f = np.zeros(dim)
        f[-1] = -1.0e-2
        force = f

    a = BilinearForm(fes).add_domain_integrator("elasticity", coeff=(lam, mu))
    A = a.assemble(dtype).operator()
    b = boundary_lf_vector(fes, force, bdr_marker=force_bdr, dtype=dtype)

    ess_scalar = fes.essential_dofs(fixed_bdr)
    ess = np.concatenate(
        [ess_scalar + c * fes.ndof_scalar for c in range(dim)]
    )
    x0 = jnp.zeros(fes.ndof, dtype=real_t(dtype))
    Ac, B = form_linear_system(A, ess, x0, b)
    M = jacobi(Ac.diagonal())
    x, info = cg(Ac.mult, B, M=M, rel_tol=rel_tol, max_iter=max_iter)
    return ElasticityResult(
        fes=fes, u=x, iterations=int(info.iterations),
        converged=bool(info.converged),
    )
