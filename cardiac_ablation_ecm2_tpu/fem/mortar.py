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
    if geom == Geometry.SQUARE:
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
            # constraint rows act on free dofs only: fold the Dirichlet
            # values into the rhs, then ZERO B entries at fixed columns so
            # the projector P = I − Bᵀ(BBᵀ)⁻¹B has no component along
            # them (otherwise x = xp + proj(y) perturbs the BC wherever a
            # mortar row touches a Dirichlet dof — r3 advisor finding)
            ra = -g0[jnp.asarray(rows)] - Ba.mult(fv * fm)
            val_free = Ba.val * free[Ba.idx]
            # drop rows that became empty (constraint entirely on fixed
            # dofs — the BC decides them; keeping them would make BBᵀ
            # singular)
            keep = np.asarray(jnp.abs(val_free).sum(axis=1) > 0)
            if not keep.all():
                rows = rows[keep]
                if rows.size == 0:
                    u, _ = cg(A_bc, rhs, M=M, rel_tol=rel_tol,
                              max_iter=max_iter)
                    lam = jnp.zeros(B.m, f.dtype)
                    if active_prev is not None and np.array_equal(
                            active, active_prev):
                        return u, lam, it + 1
                    active_prev = active
                    continue
                kj = jnp.asarray(np.nonzero(keep)[0])
                val_free = val_free[kj]
                Ba = Constraints(idx=Ba.idx[kj], val=Ba.val[kj], n=Ba.n,
                                 rowstarts=np.arange(rows.size + 1))
                ra = ra[kj]
            Ba = Constraints(idx=Ba.idx, val=val_free, n=Ba.n,
                             rowstarts=Ba.rowstarts)
            u, la, info = eliminate_constrained_solve(
                A_bc, Ba, rhs, r=ra, M=M, rel_tol=rel_tol,
                max_iter=max_iter)
            lam = jnp.zeros(B.m, f.dtype).at[jnp.asarray(rows)].set(-la)
        if active_prev is not None and np.array_equal(active, active_prev):
            return u, lam, it + 1
        active_prev = active
    return u, lam, max_outer


def _poly_area(pts: np.ndarray) -> float:
    """Signed (shoelace) area of a 2D polygon."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _clip_to_ref_tri(poly: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of a CCW 2D polygon against the reference
    triangle {u ≥ 0, v ≥ 0, u + v ≤ 1}."""
    def clip(pts, f):
        out = []
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            fa, fb = f(a), f(b)
            if fa >= -1e-12:
                out.append(a)
            if (fa > 1e-12 and fb < -1e-12) or (fa < -1e-12 and fb > 1e-12):
                t = fa / (fa - fb)
                out.append(a + t * (b - a))
        return out

    pts = [np.asarray(q, dtype=float) for q in poly]
    for f in (lambda q: q[0], lambda q: q[1],
              lambda q: 1.0 - q[0] - q[1]):
        pts = clip(pts, f)
        if len(pts) < 3:
            return np.zeros((0, 2))
    return np.asarray(pts)


def _polys_to_rule(polys, qt: np.ndarray, wt: np.ndarray):
    """Map a reference-triangle rule (weights summing to its area 1/2)
    onto the centroid fans of 2D polygons; returns (pts, wts)."""
    pts, wts = [], []
    for cp in polys:
        ctr = cp.mean(axis=0)
        m = len(cp)
        for k in range(m):
            v0, v1 = cp[k], cp[(k + 1) % m]
            a2 = ((v0[0] - ctr[0]) * (v1[1] - ctr[1])
                  - (v1[0] - ctr[0]) * (v0[1] - ctr[1]))
            if abs(a2) < 1e-14:
                continue
            pts.append(ctr[None, :] + qt[:, :1] * (v0 - ctr)[None, :]
                       + qt[:, 1:2] * (v1 - ctr)[None, :])
            wts.append(wt * abs(a2))
    if not pts:
        return np.zeros((0, 2)), np.zeros(0)
    return np.concatenate(pts), np.concatenate(wts)


def _face_rule(geom: Geometry, order: int):
    """Quadrature on the reference face: points (nq, rdim), weights (nq,)."""
    from .intrules import gauss_legendre_1d, simplex_rule

    if geom == Geometry.SEGMENT:
        x, w = gauss_legendre_1d(order + 2)
        return x[:, None], w
    if geom == Geometry.SQUARE:
        x, w = gauss_legendre_1d(order + 2)
        P = np.stack([np.repeat(x, len(x)), np.tile(x, len(x))], axis=1)
        return P, np.outer(w, w).ravel()
    if geom == Geometry.TRIANGLE:
        return simplex_rule(2, 2 * order + 3)
    raise NotImplementedError(f"face geometry {geom}")


def build_mortar_constraints(
    fes, slave_attr: Sequence[int], master_attr: Sequence[int],
    normal_only: bool = False, dtype=jnp.float64, max_pair_dist: float = 0.5,
) -> MortarPairing:
    """Segment-integrated (true mortar) interface constraints.

    Instead of collocating at slave nodes (``build_tie_constraints``), each
    multiplier ψ_i — the slave trace basis — enforces the *weak* equality

        ∫_Γs ψ_i (u_s − u_m) ds = 0            (tied; per component)
        ∫_Γs ψ_i n·(u_s − u_m) ds ≥ −g_i       (normal/contact mode)

    integrated with Gauss rules on the slave faces, master values evaluated
    at the closest-point projections.  This is the standard mortar coupling
    (the role Tribol fills for ``miniapps/contact``) and — unlike
    collocation — transmits constant stress exactly across non-matching
    grids (patch test).  Weighted gaps g_i = ∫ ψ_i n·(x_s − x_m) ds.
    """
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
    row_of = {int(d): i for i, d in enumerate(sdofs)}
    nrow = len(sdofs)

    mC = coords[gmap[mfaces]]                  # (nmf, nd, sdim)
    lo = mC.min(axis=1) - max_pair_dist
    hi = mC.max(axis=1) + max_pair_dist

    qref0, qw0 = _face_rule(bgeom, p)

    # accumulate rows as {col: coeff}; one row per (slave dof, component)
    # in tied mode, one per slave dof in normal mode
    acc = [dict() for _ in range(nrow * (1 if normal_only else vdim))]
    gaps = np.zeros(nrow)
    nrm_acc = np.zeros((nrow, mesh.dim))

    for fi, f in enumerate(sfaces):
        Cs = coords[gmap[f]]                   # (nd, sdim)
        if bgeom == Geometry.SEGMENT:
            # mortar segmentation: split the slave segment where master
            # face endpoints project onto it — the master trace has kinks
            # there, and exact sub-segment Gauss is what makes the patch
            # test exact (the role of Tribol's mortar segments)
            s0, s1 = Cs[0], Cs[-1]
            d01 = s1 - s0
            L2 = float(d01 @ d01)
            breaks = []
            slo = Cs.min(axis=0) - max_pair_dist
            shi = Cs.max(axis=0) + max_pair_dist
            near2 = np.nonzero((mC.min(axis=1) <= shi).all(axis=1)
                               & (mC.max(axis=1) >= slo).all(axis=1))[0]
            for ci in near2:
                for vtx in (mC[ci][0], mC[ci][-1]):
                    t = float((vtx - s0) @ d01) / L2
                    if 1e-9 < t < 1 - 1e-9:
                        if np.linalg.norm(s0 + t * d01 - vtx) \
                                < max_pair_dist:
                            breaks.append(t)
            from .cutcells import _split_gauss_1d

            q1, w1 = _split_gauss_1d(0.0, 1.0, breaks, qref0[:, 0], qw0)
            qref, qw = q1[:, None], w1
        elif bgeom == Geometry.SQUARE:
            # 3D mortar segmentation: tensor-split the slave reference
            # square at the projections of nearby master-face corners.
            # For lattice-like flat interfaces the master-trace kinks are
            # iso-lines of the slave parametrization through those
            # projections, so sub-rectangle Gauss is exact (the 2D analog
            # of the segment splits); for irregular interfaces the splits
            # still track the kink locations to first order.
            from .cutcells import _split_gauss_1d
            from .intrules import gauss_legendre_1d

            sc = Cs.mean(axis=0)
            near = np.nonzero(((sc >= lo) & (sc <= hi)).all(axis=1))[0]
            bu, bv = [], []
            for ci in near:
                for vtx in mC[ci][[0, p, -1 - p, -1]]:
                    xi, dist = _closest_point(bgeom, p, Cs, vtx)
                    if dist <= max_pair_dist:
                        if 1e-9 < xi[0] < 1 - 1e-9:
                            bu.append(float(xi[0]))
                        if 1e-9 < xi[1] < 1 - 1e-9:
                            bv.append(float(xi[1]))
            x1g, w1g = gauss_legendre_1d(p + 2)
            qu, wu = _split_gauss_1d(0.0, 1.0, bu, x1g, w1g)
            qv, wv = _split_gauss_1d(0.0, 1.0, bv, x1g, w1g)
            qref = np.stack([np.repeat(qu, len(qv)),
                             np.tile(qv, len(qu))], axis=1)
            qw = np.outer(wu, wv).ravel()
        elif bgeom == Geometry.TRIANGLE:
            # TRIANGLE-slave mortar segmentation (the simplex analog of
            # the tensor splits; the role of Tribol's clipped mortar
            # segments): project each nearby master face affinely into
            # the slave's (u,v) frame, clip against the reference
            # triangle, and integrate each clip cell with its own mapped
            # Gauss rule — the master trace is smooth inside a cell and
            # kinked only on its boundary, so per-cell Gauss restores
            # patch-test exactness on non-matching tet grids.  Falls back
            # to the plain rule when the projections do not tile the
            # slave face (holes/overlaps — e.g. strongly curved masters).
            nd_f = gmap.shape[1]
            c_idx = [0, p, nd_f - 1]       # lattice corners (0,0),(p,0),(0,p)
            S0 = Cs[c_idx[0]]
            Emat = np.stack([Cs[c_idx[1]] - S0, Cs[c_idx[2]] - S0], axis=1)
            EtE = Emat.T @ Emat
            sc = Cs.mean(axis=0)
            near = np.nonzero(((sc >= lo) & (sc <= hi)).all(axis=1))[0]
            polys = []
            for ci in near:
                uv, ok = [], True
                for vtx in mC[ci][c_idx]:
                    t = np.linalg.solve(EtE, Emat.T @ (vtx - S0))
                    if np.linalg.norm(Emat @ t + S0 - vtx) > max_pair_dist:
                        ok = False
                        break
                    uv.append(t)
                if not ok:
                    continue
                uv = np.asarray(uv)
                if _poly_area(uv) < 0:
                    uv = uv[::-1]
                cp = _clip_to_ref_tri(uv)
                if len(cp) >= 3 and _poly_area(cp) > 1e-12:
                    polys.append(cp)
            cover = sum(_poly_area(cp) for cp in polys)
            if polys and abs(cover - 0.5) < 1e-8:
                qref, qw = _polys_to_rule(polys, qref0, qw0)
            else:
                qref, qw = qref0, qw0
        else:
            qref, qw = qref0, qw0
        Bq, Gq = _face_basis(bgeom, p, qref)   # (nq, nd), (nq, nd, rdim)
        nq = len(qw)
        Xq = Bq @ Cs                           # (nq, sdim) physical qpoints
        # surface measure at each qp
        J = np.einsum("qnr,ns->qsr", Gq, Cs)   # (nq, sdim, rdim)
        if mesh.dim == 2:
            ds = np.linalg.norm(J[:, :, 0], axis=1)
        else:
            ds = np.linalg.norm(np.cross(J[:, :, 0], J[:, :, 1]), axis=1)
        w = qw * ds
        for q in range(nq):
            x = Xq[q]
            cand = np.nonzero(((x >= lo) & (x <= hi)).all(axis=1))[0]
            if len(cand) == 0:
                continue
            best = None
            for ci in cand:
                xi, dist = _closest_point(bgeom, p, mC[ci], x)
                if best is None or dist < best[0]:
                    best = (dist, ci, xi)
            dist, ci, xi = best
            if dist > max_pair_dist:
                continue
            phi_m, _ = _face_basis(bgeom, p, xi[None])
            phi_m = phi_m[0]
            mdofs = gmap[mfaces[ci]]
            nrm = fnormals[mfaces[ci]]
            xm = phi_m @ mC[ci]
            for i_loc, sd in enumerate(gmap[f]):
                psi = Bq[q, i_loc]
                if abs(psi) < 1e-14:
                    continue
                ri = row_of[int(sd)]
                # u_s(q) = Σ_j φ_j(q) u_j over the slave face trace;
                # u_m(q) = Σ_j φ^m_j(ξ*) u_j over the master face
                if normal_only:
                    row = acc[ri]
                    gaps[ri] += w[q] * psi * float(nrm @ (x - xm))
                    nrm_acc[ri] += w[q] * psi * nrm
                    for c in range(vdim):
                        for j_loc, sj in enumerate(gmap[f]):
                            if abs(Bq[q, j_loc]) > 1e-14:
                                key = int(sj) + c * ns
                                row[key] = row.get(key, 0.0) + \
                                    w[q] * psi * Bq[q, j_loc] * nrm[c]
                        for jm, md in enumerate(mdofs):
                            if abs(phi_m[jm]) > 1e-14:
                                key = int(md) + c * ns
                                row[key] = row.get(key, 0.0) - \
                                    w[q] * psi * phi_m[jm] * nrm[c]
                else:
                    for c in range(vdim):
                        row = acc[ri * vdim + c]
                        for j_loc, sj in enumerate(gmap[f]):
                            if abs(Bq[q, j_loc]) > 1e-14:
                                key = int(sj) + c * ns
                                row[key] = row.get(key, 0.0) + \
                                    w[q] * psi * Bq[q, j_loc]
                        for jm, md in enumerate(mdofs):
                            if abs(phi_m[jm]) > 1e-14:
                                key = int(md) + c * ns
                                row[key] = row.get(key, 0.0) - \
                                    w[q] * psi * phi_m[jm]

    rows = [sorted(r.items()) for r in acc if r]
    kept = [i for i, r in enumerate(acc) if r]
    B = from_rows([[(k, v) for k, v in r] for r in rows], fes.ndof,
                  dtype=dtype)
    if normal_only:
        nn = nrm_acc[kept]
        nn = nn / np.maximum(np.linalg.norm(nn, axis=1, keepdims=True),
                             1e-300)
        return MortarPairing(B=B, gaps=gaps[kept], normals=nn,
                             slave_dofs=sdofs)
    return MortarPairing(B=B, slave_dofs=sdofs)
