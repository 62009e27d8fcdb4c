"""Mortar-style interface constraints between two bodies.

Reference analog: the tied/sliding contact in ``miniapps/contact/`` (which
pairs surfaces via Tribol) and the ConstrainedSolver framework those
constraints feed (``linalg/constraints.hpp``).  Here a node-to-segment
(2D) / node-to-face (3D) collocation mortar:

* each *slave* boundary node is closest-point-projected onto the *master*
  surface (Newton on the isoparametric face map, any order);
* a **tied** constraint equates every displacement component,
  ``u(slave) − Σ φ_i(ξ*) u(master_i) = 0``;
* a **normal** (sliding/contact) constraint keeps only the master-normal
  component and also returns the initial gap ``g0 = n·(x_s − X(ξ*))`` so
  non-penetration reads ``g0 + B u ≥ 0``.

The constraints are host-built (setup phase) and returned as the padded-
sparse ``linalg.constrained.Constraints``, so every solve strategy
(elimination/penalty/Schur) and the PDAS contact loop run fully on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..linalg.constrained import (Constraints, boundary_face_normals,
                                  eliminate_constrained_solve, from_rows)
from ..linalg.solvers import cg
from .basis import (Geometry, h1_nodes_1d, lagrange_matrices,
                    simplex_basis_matrices)


def _face_basis(geom: Geometry, p: int, pts: np.ndarray):
    """Nodal basis values/gradients at reference points on a face geometry.

    Index order matches the boundary gather map (the same convention the
    boundary linear forms reduce through — ops/linearform._bdr_geom)."""
    pts = np.atleast_2d(pts)
    if geom == Geometry.SEGMENT:
        B1, G1 = lagrange_matrices(h1_nodes_1d(p), pts[:, 0])
        return B1, G1[..., None]
    if geom == Geometry.QUAD:
        Bx, Gx = lagrange_matrices(h1_nodes_1d(p), pts[:, 0])
        By, Gy = lagrange_matrices(h1_nodes_1d(p), pts[:, 1])
        # lex order: i = ix + (p+1)*iy
        B = (By[:, :, None] * Bx[:, None, :]).reshape(len(pts), -1)
        Gu = (By[:, :, None] * Gx[:, None, :]).reshape(len(pts), -1)
        Gv = (Gy[:, :, None] * Bx[:, None, :]).reshape(len(pts), -1)
        return B, np.stack([Gu, Gv], axis=-1)
    if geom == Geometry.TRIANGLE:
        return simplex_basis_matrices(geom, p, pts)
    raise NotImplementedError(f"face geometry {geom}")


def _clamp_ref(geom: Geometry, xi: np.ndarray) -> np.ndarray:
    xi = np.clip(xi, 0.0, 1.0)
    if geom == Geometry.TRIANGLE and xi.sum() > 1.0:
        # project onto the hypotenuse x + y = 1
        t = (xi[0] - xi[1] + 1.0) / 2.0
        t = np.clip(t, 0.0, 1.0)
        xi = np.array([t, 1.0 - t])
    return xi


def _closest_point(geom: Geometry, p: int, C: np.ndarray, x: np.ndarray,
                   iters: int = 25) -> Tuple[np.ndarray, float]:
    """Clamped Newton for min_ξ |X(ξ) − x|², X(ξ) = Σ φ_i(ξ) C_i.

    Returns (ξ*, distance)."""
    rdim = 1 if geom == Geometry.SEGMENT else 2
    xi = np.full(rdim, 0.5 if geom != Geometry.TRIANGLE else 1.0 / 3.0)
    for _ in range(iters):
        B, G = _face_basis(geom, p, xi[None])
        X = B[0] @ C                                  # (sdim,)
        J = np.einsum("nd,ns->sd", G[0], C)           # (sdim, rdim)
        rvec = X - x
        g = J.T @ rvec                                # (rdim,)
        H = J.T @ J
        try:
            step = np.linalg.solve(H + 1e-14 * np.eye(rdim), -g)
        except np.linalg.LinAlgError:
            break
        xi_new = _clamp_ref(geom, xi + step)
        if np.linalg.norm(xi_new - xi) < 1e-14:
            xi = xi_new
            break
        xi = xi_new
    B, _ = _face_basis(geom, p, xi[None])
    return xi, float(np.linalg.norm(B[0] @ C - x))


@dataclass
class MortarPairing:
    """One row per (slave node, component) or per slave node (normal mode)."""

    B: Constraints
    gaps: Optional[np.ndarray] = None      # (nslave,) initial gaps (normal)
    normals: Optional[np.ndarray] = None   # (nslave, sdim) master normals
    slave_dofs: Optional[np.ndarray] = None


def build_tie_constraints(
    fes, slave_attr: Sequence[int], master_attr: Sequence[int],
    normal_only: bool = False, dtype=jnp.float64, max_pair_dist: float = 0.5,
) -> MortarPairing:
    """Pair each slave-surface node with the master surface.

    ``normal_only=False`` → tied interface (all ``vdim`` components);
    ``normal_only=True``  → sliding/contact pairing (master-normal
    component only) with initial gaps."""
    mesh = fes.mesh
    ns = fes.ndof_scalar
    vdim = fes.vdim
    p = fes.order
    gmap = np.asarray(fes.bdr_gather_map)
    att = np.asarray(mesh.bdr_attributes)
    coords = np.asarray(fes.dof_coords)
    bgeom = mesh.bdr_geom
    fnormals = boundary_face_normals(mesh)

    sfaces = np.nonzero(np.isin(att, np.asarray(list(slave_attr))))[0]
    mfaces = np.nonzero(np.isin(att, np.asarray(list(master_attr))))[0]
    if len(sfaces) == 0 or len(mfaces) == 0:
        raise ValueError("empty slave or master surface")
    sdofs = np.unique(gmap[sfaces].ravel())

    # bounding boxes of master faces for candidate prefiltering
    mC = coords[gmap[mfaces]]                      # (nmf, nd, sdim)
    lo = mC.min(axis=1) - max_pair_dist
    hi = mC.max(axis=1) + max_pair_dist

    rows, gaps, normals, starts = [], [], [], [0]
    for d in sdofs:
        x = coords[d]
        cand = np.nonzero(((x >= lo) & (x <= hi)).all(axis=1))[0]
        if len(cand) == 0:
            continue
        best = None
        for ci in cand:
            C = mC[ci]
            xi, dist = _closest_point(bgeom, p, C, x)
            if best is None or dist < best[0]:
                best = (dist, ci, xi)
        dist, ci, xi = best
        if dist > max_pair_dist:
            continue
        B1, _ = _face_basis(bgeom, p, xi[None])
        phi = B1[0]
        mdofs = gmap[mfaces[ci]]
        if normal_only:
            nrm = fnormals[mfaces[ci]]
            Cxi = phi @ mC[ci]
            row = []
            for c in range(vdim):
                row.append((int(d) + c * ns, float(nrm[c])))
                for i, md in enumerate(mdofs):
                    if abs(phi[i]) > 1e-13:
                        row.append((int(md) + c * ns, float(-phi[i] * nrm[c])))
            rows.append(row)
            gaps.append(float(np.dot(nrm, x - Cxi)))
            normals.append(nrm)
            starts.append(len(rows))
        else:
            for c in range(vdim):
                row = [(int(d) + c * ns, 1.0)]
                for i, md in enumerate(mdofs):
                    if abs(phi[i]) > 1e-13:
                        row.append((int(md) + c * ns, float(-phi[i])))
                rows.append(row)
            starts.append(len(rows))
    B = from_rows(rows, fes.ndof, rowstarts=np.asarray(starts), dtype=dtype)
    return MortarPairing(
        B=B,
        gaps=np.asarray(gaps) if normal_only else None,
        normals=np.asarray(normals) if normal_only else None,
        slave_dofs=sdofs)


def contact_solve(
    Amult: Callable, pairing: MortarPairing, f: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    fixed_mask: Optional[jnp.ndarray] = None,
    fixed_vals: Optional[jnp.ndarray] = None,
    c: float = 1e4, max_outer: int = 30, rel_tol: float = 1e-11,
    max_iter: int = 4000,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Two-body frictionless contact by primal–dual active set.

    KKT system (non-penetration ``g0 + B u ≥ 0``, pressure ``λ ≥ 0``):

        A u − Bᵀ λ = f,   λ ≥ 0,   g0 + B u ≥ 0,   λ·(g0 + B u) = 0.

    Each outer iteration freezes the active set {λ + c·(−g0 − B u) > 0}
    and solves the equality-constrained problem ``B_a u = −g0_a`` by
    projected CG (``eliminate_constrained_solve``); Dirichlet dofs are
    handled with the usual masked-identity wrap.  Mirrors the PDAS loop of
    ``linalg/obstacle.py`` with mortar rows instead of nodal bounds."""
    B, g0 = pairing.B, jnp.asarray(pairing.gaps, f.dtype)
    n = f.shape[0]
    fm = jnp.zeros(n, f.dtype) if fixed_mask is None else jnp.asarray(
        fixed_mask, f.dtype)
    fv = jnp.zeros(n, f.dtype) if fixed_vals is None else jnp.asarray(
        fixed_vals, f.dtype)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return Amult(z) * free + (v - z)

    rhs = (f - Amult(fv * fm)) * free + fv * fm
    d = diag if diag is not None else jnp.ones(n, f.dtype)
    dg = d * free + fm
    M = lambda v: v / dg

    u = fv * fm
    lam = jnp.zeros(B.m, f.dtype)
    active_prev = None
    for it in range(max_outer):
        gap = g0 + B.mult(u)
        active = np.asarray(lam - c * gap > 0)
        if not active.any():
            u, _ = cg(A_bc, rhs, M=M, rel_tol=rel_tol, max_iter=max_iter)
            lam = jnp.zeros(B.m, f.dtype)
        else:
            rows = np.nonzero(active)[0]
            Ba = B.select_rows(rows)
            # constraint rows act on free dofs only (Dirichlet folded in)
            ra = -g0[jnp.asarray(rows)] - Ba.mult(fv * fm)
            u, la, info = eliminate_constrained_solve(
                A_bc, Ba, rhs, r=ra, M=M, rel_tol=rel_tol,
                max_iter=max_iter)
            lam = jnp.zeros(B.m, f.dtype).at[jnp.asarray(rows)].set(-la)
        if active_prev is not None and np.array_equal(active, active_prev):
            return u, lam, it + 1
        active_prev = active
    return u, lam, max_outer
