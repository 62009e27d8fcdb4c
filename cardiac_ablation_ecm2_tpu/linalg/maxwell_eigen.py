"""Maxwell cavity eigensolver: LOBPCG with AMS-style gradient projection.

Reference analog: ``HypreAME`` (``linalg/hypre.hpp:2295``) — the Maxwell
eigenvalue solver used to compute cavity modes

    (curl E, curl F) = λ (E, F),   n × E = 0 on the PEC boundary,

whose difficulty is the huge gradient nullspace of the curl-curl operator
(curl ∇p = 0).  AME removes it by keeping the LOBPCG block M-orthogonal to
the discrete gradients ∇H1; the projector here is algebraic and works for
*any* compatible order, built purely from the mixed integrator
Gₘ = (∇u, v) (``ops.mixed_vecfe.mixed_vector_gradient``):

    P = I − M⁻¹ Gₘ A₁⁻¹ Gₘᵀ,     A₁ = (∇u, ∇v)  on H1 with matching BCs,

since Gₘᵀ x = 0 ⇔ x ⊥_M ∇H1 (the interpolated gradient of an H1_p
function is exact in ND_p).  Each projection costs one H1-diffusion CG and
one ND-mass CG — both Jacobi-preconditioned and well-conditioned.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.bilinearform import BilinearForm
from ..ops.mixed_vecfe import mixed_vector_gradient
from ..ops.vecfe import build_nd_operator
from ..utils.config import real_t
from .lobpcg import lobpcg
from .solvers import cg


@dataclasses.dataclass
class MaxwellEigResult:
    eigenvalues: np.ndarray       # (k,) ascending, gradients removed
    eigenvectors: jnp.ndarray     # (ndof, k) ND coefficients
    iterations: int


def maxwell_eigenvalues(
    nd_space,
    h1_fes,
    k: int = 5,
    ess_bdr: Optional[Sequence[int]] = "all",
    nq1d: Optional[int] = None,
    iters: int = 60,
    inner_tol: float = 1e-10,
    seed: int = 0,
    dtype=None,
    sigma=None,
) -> MaxwellEigResult:
    """Smallest k nonzero Maxwell eigenvalues on an ND space.

    ``h1_fes`` — scalar H1 space of the same order on the same mesh (the
    gradient-space of the projector).  ``ess_bdr="all"`` imposes PEC
    (n × E = 0) on every boundary attribute.  ``sigma`` — optional (d×d)
    permittivity matrix for the anisotropic pencil
    (curl E, curl F) = λ (σE, F) — the ex32p problem; the projector's
    gradient pairing and H1 operator are σ-weighted accordingly."""
    rt = real_t(dtype)
    mesh = nd_space.mesh
    if nq1d is None:
        nq1d = getattr(nd_space, "order", 1) + 2

    A = build_nd_operator(nd_space, mass_coeff=None, curlcurl_coeff=1.0,
                          nq1d=nq1d, dtype=dtype)
    M = build_nd_operator(nd_space,
                          mass_coeff=(1.0 if sigma is None else sigma),
                          curlcurl_coeff=None, nq1d=nq1d, dtype=dtype)
    Gm = mixed_vector_gradient(h1_fes, nd_space, nq1d=nq1d, dtype=dtype,
                               matrix_coeff=sigma)
    sig_cb = None
    if sigma is not None:
        sig_np = np.asarray(sigma, dtype=np.float64)

        def sig_cb(x):
            return np.broadcast_to(sig_np, x.shape[:-1] + sig_np.shape)

    A1 = BilinearForm(h1_fes, nq1d=nq1d) \
        .add_domain_integrator("diffusion", coeff=sig_cb) \
        .assemble(dtype=dtype)

    if ess_bdr == "all":
        ess_bdr = sorted(set(mesh.bdr_attributes.tolist())) if mesh.nbe \
            else []
    ess_nd = nd_space.essential_dofs(ess_bdr) if ess_bdr else \
        np.zeros(0, np.int32)
    ess_h1 = h1_fes.essential_dofs(ess_bdr) if ess_bdr else \
        np.zeros(0, np.int32)

    m_nd = jnp.ones(A.ndof, rt)
    if len(ess_nd):
        m_nd = m_nd.at[jnp.asarray(ess_nd)].set(0.0)
    m_h1 = jnp.ones(h1_fes.ndof_scalar, rt)
    if len(ess_h1):
        m_h1 = m_h1.at[jnp.asarray(ess_h1)].set(0.0)

    dM = M.diagonal() * m_nd + (1 - m_nd)
    dA1 = A1.diagonal() * m_h1 + (1 - m_h1)

    def Amult(v):
        return A.mult(v * m_nd) * m_nd

    def Mmult(v):
        return M.mult(v * m_nd) * m_nd

    import jax

    def Msolve(b):
        x, _ = cg(lambda v: Mmult(v) + (1 - m_nd) * v, b,
                  M=lambda r: r / dM, rel_tol=inner_tol, max_iter=2000)
        return x

    def A1solve(b):
        def op(v):
            return A1.mult(v * m_h1) * m_h1 + (1 - m_h1) * v

        x, _ = cg(op, b * m_h1, M=lambda r: r / dA1,
                  rel_tol=inner_tol, max_iter=2000)
        return x * m_h1

    @jax.jit
    def project(x):
        """x ← x − M⁻¹ Gₘ A₁⁻¹ Gₘᵀ x  (then mask PEC dofs); one jitted
        computation — the nested CG loops dominate the eigensolver cost."""
        x = x * m_nd
        y = A1solve(Gm.mult_t(x))
        return (x - Msolve(Gm.mult(y) * m_nd)) * m_nd

    # Jacobi on A+M keeps the preconditioner SPD despite A's nullspace
    dAM = (A.diagonal() + M.diagonal()) * m_nd + (1 - m_nd)

    res = lobpcg(
        Amult, Mmult, A.ndof, k,
        precond=lambda v: v / dAM,
        iters=iters, seed=seed, dtype=rt,
        constraint=project,
    )
    return MaxwellEigResult(
        eigenvalues=np.asarray(res.eigenvalues),
        eigenvectors=res.eigenvectors,
        iterations=iters,
    )
