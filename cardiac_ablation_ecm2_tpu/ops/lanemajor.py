"""Lane-major (transposed) full-matrix PA applies — the shared fast path.

The E-vector is laid out ``(nd, ne)``: every basis contraction becomes a
``(nq, nd) @ (nd, ne)`` matmul with the ELEMENT axis riding the TPU's
128-lane dimension, so the MXU runs at full occupancy instead of contracting
over small trailing dims.  Round 2 proved this out privately inside
``models/bioheat.py`` (1.38 → 0.84 ms/apply at 912k dofs on v5e AND ~10×
lower fp error vs the f64 reference — full-width HIGHEST matmuls beat the
staged einsum chain's accumulation); this module generalizes it so
mass/diffusion/convection, ``BilinearForm``/``PAOperator``, and the BP
harness all share one code path.

Works for tensor-product bases (full matrices built once by Kronecker
product of the 1D ``B1/G1`` factors, dims 1/2/3) and for non-tensor simplex
bases (``db.B`` / ``db.G`` already ARE the full matrices) — tets get the
same treatment for free.

Reference analog: ``DofToQuad::Mode::FULL`` (``fem/fe/fe_base.hpp:140``) —
the dense dofs→quads matrices MFEM reserves for non-tensor elements, used
here for ALL elements at production orders because a dense ``(nq × nd)``
matmul with ``ne`` on the lane axis beats the factorized chain on the MXU
up to ``nd ≈ 256`` (p ≤ 5 hexes).  Above that, callers fall back to the
staged sum-factorized path (``fem/quadinterp.py``).

Layout conventions (matching ``fem/quadinterp.py``): E-vectors are lex-flat
with x fastest, so the full matrix acting on a flattened ``(k, j, i)``
tensor is ``kron(Fz, Fy, Fx)`` (rightmost factor acts on the fastest index).
Packed symmetric diffusion qdata is ``[00, 11, 01]`` (2D) /
``[00, 11, 22, 01, 02, 12]`` (3D) as produced by ``diffusion.pack_sym``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.quadinterp import DeviceBasis

#: Full-width f32 accumulation: measured ~10× lower error than the staged
#: einsum chain AND faster (the matmuls are large enough to hide the passes).
_P = jax.lax.Precision.HIGHEST


def _mm(A, b):
    return jnp.matmul(A, b, precision=_P)


@dataclasses.dataclass(frozen=True, eq=False)
class LaneBasis:
    """Full (nq, nd) dofs→quads matrices for the lane-major apply."""

    dim: int
    Bf: jnp.ndarray                  # (nq, nd) values
    G: Tuple[jnp.ndarray, ...]       # per reference axis, (nq, nd)

    @property
    def nd(self) -> int:
        return self.Bf.shape[1]


# Keyed by id(db); values hold a strong ref to db so ids are never reused.
_CACHE: dict = {}


def lane_basis(db: DeviceBasis) -> LaneBasis:
    """Build (and cache) the full matrices for a device basis."""
    hit = _CACHE.get(id(db))
    if hit is not None:
        return hit[1]
    if db.tensor:
        B1 = np.asarray(db.B1)
        G1 = np.asarray(db.G1)
        dt = B1.dtype
        if db.dim == 1:
            Bf, G = B1, (G1,)
        elif db.dim == 2:
            Bf = np.kron(B1, B1)
            G = (np.kron(B1, G1), np.kron(G1, B1))
        else:
            Bf = np.kron(B1, np.kron(B1, B1))
            G = (
                np.kron(B1, np.kron(B1, G1)),
                np.kron(B1, np.kron(G1, B1)),
                np.kron(G1, np.kron(B1, B1)),
            )
        lb = LaneBasis(
            dim=db.dim,
            Bf=jnp.asarray(Bf, dt),
            G=tuple(jnp.asarray(g, dt) for g in G),
        )
    else:
        G = tuple(db.G[:, :, d] for d in range(db.dim))
        lb = LaneBasis(dim=db.dim, Bf=db.B, G=G)
    _CACHE[id(db)] = (db, lb)
    return lb


def supports(db: DeviceBasis, qdata=None, kind: str = "",
             max_nd: int = 256) -> bool:
    """Whether the lane-major path applies: full matrices available and small
    enough that dense MXU matmuls beat the factorized chain."""
    if db.tensor:
        nd = db.n1d ** db.dim
    elif db.B is not None and db.G is not None:
        nd = db.B.shape[1]
    else:
        return False
    if nd > max_nd:
        return False
    if kind == "diffusion" and qdata is not None:
        # only packed-symmetric (k, ne, nq) layout is supported
        return qdata.ndim == 3 and qdata.shape[0] in (3, 6)
    return True


# ----------------------------------------------------------------------------
# qdata transposition (done ONCE at setup; same bytes, lane-major stream)
# ----------------------------------------------------------------------------


def mass_qT(qd: jnp.ndarray) -> jnp.ndarray:
    """(ne|1, nq) → (nq, ne|1)."""
    return qd.T


def diffusion_qT(qd_packed: jnp.ndarray) -> jnp.ndarray:
    """Packed symmetric (3|6, ne|1, nq) → (3|6, nq, ne|1)."""
    return jnp.transpose(qd_packed, (0, 2, 1))


def convection_qT(qd: jnp.ndarray) -> jnp.ndarray:
    """(ne, nq, dim) → (dim, nq, ne)."""
    return jnp.transpose(qd, (2, 1, 0))


# ----------------------------------------------------------------------------
# applies — all take/return transposed E-vectors (nd, ne)
# ----------------------------------------------------------------------------


def mass_apply(lb: LaneBasis, qT: jnp.ndarray, eT: jnp.ndarray) -> jnp.ndarray:
    """Bᵀ (q ∘ (B u)) in lane-major layout."""
    return _mm(lb.Bf.T, qT * _mm(lb.Bf, eT))


def _diff_flux(lb: LaneBasis, qT: jnp.ndarray, eT: jnp.ndarray):
    """Gradients and the packed-symmetric D·g products."""
    g = [_mm(Gd, eT) for Gd in lb.G]
    if lb.dim == 1:
        return [qT[0] * g[0]]
    if lb.dim == 2:
        gx, gy = g
        return [qT[0] * gx + qT[2] * gy, qT[2] * gx + qT[1] * gy]
    gx, gy, gz = g
    return [
        qT[0] * gx + qT[3] * gy + qT[4] * gz,
        qT[3] * gx + qT[1] * gy + qT[5] * gz,
        qT[4] * gx + qT[5] * gy + qT[2] * gz,
    ]


def diffusion_apply(lb: LaneBasis, qT: jnp.ndarray,
                    eT: jnp.ndarray) -> jnp.ndarray:
    """Gᵀ (D ∘ (G u)), packed-symmetric qT (3|6, nq, ne|1)."""
    D = _diff_flux(lb, qT, eT)
    out = _mm(lb.G[0].T, D[0])
    for d in range(1, lb.dim):
        out = out + _mm(lb.G[d].T, D[d])
    return out


def convection_apply(lb: LaneBasis, qT: jnp.ndarray,
                     eT: jnp.ndarray) -> jnp.ndarray:
    """Bᵀ (q · (G u)), qT (dim, nq, ne)."""
    s = qT[0] * _mm(lb.G[0], eT)
    for d in range(1, lb.dim):
        s = s + qT[d] * _mm(lb.G[d], eT)
    return _mm(lb.Bf.T, s)


def mass_diffusion_apply(lb: LaneBasis, qmT: jnp.ndarray, qdT: jnp.ndarray,
                         eT: jnp.ndarray, gamma=None) -> jnp.ndarray:
    """Fused (M + γ K) v — one gradient evaluation, one value evaluation,
    single pass over the qdata streams (the bioheat implicit-stage LHS)."""
    D = _diff_flux(lb, qdT, eT)
    diff = _mm(lb.G[0].T, D[0])
    for d in range(1, lb.dim):
        diff = diff + _mm(lb.G[d].T, D[d])
    m = _mm(lb.Bf.T, qmT * _mm(lb.Bf, eT))
    if gamma is None:
        return m + diff
    return m + gamma * diff


_APPLY = {
    "mass": mass_apply,
    "diffusion": diffusion_apply,
    "convection": convection_apply,
}

_QT = {
    "mass": mass_qT,
    "diffusion": diffusion_qT,
    "convection": convection_qT,
}


def transpose_qdata(kind: str, qd: jnp.ndarray) -> jnp.ndarray:
    return _QT[kind](qd)


def apply_terms(lb: LaneBasis, terms: Sequence[Tuple[str, jnp.ndarray]],
                eT: jnp.ndarray) -> jnp.ndarray:
    """Sum of lane-major integrator applies sharing one E-vector."""
    out = None
    for kind, qT in terms:
        y = _APPLY[kind](lb, qT, eT)
        out = y if out is None else out + y
    return out
