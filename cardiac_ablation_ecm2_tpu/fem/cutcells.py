"""Quadrature on implicit (level-set) subdomains and interfaces.

Reference analog: ``fem/intrules_cut.hpp`` — ``CutIntegrationRules`` with the
``MomentFittingIntRules`` / ``AlgoimIntegrationRules`` backends used by
``examples/ex38.cpp`` (integration over {φ>0} and over the isoline {φ=0}).

TPU-native design: instead of per-element moment-fitting solves producing
ragged rules, rules are built by **dimension reduction with 1D root
finding** (the core idea of Algoim — Saye, SIAM J. Sci. Comput. 2015): on
each cell a height direction is chosen (the axis where |∂φ| dominates), φ
is rooted along every height line, and Gauss sub-rules are placed on the
resulting intervals.  Two refinements keep the rule high-order:

* 2D: the base interval is split at the interface's crossings of the two
  height-faces (where the root count changes), so every base sub-interval
  integrates a smooth graph;
* 3D: the base square is quadtree-subdivided until the height-face
  level sets are sign-uniform per leaf (or a depth cap), localizing the
  root-count discontinuities to O(2^{-depth}) strips.

All level-set evaluations are *batched* — the scan and the bisection run
vectorized over every bracket of every height line of a cell at once, so a
rule over thousands of cells costs a few hundred array-sized ``phi`` calls,
not millions of scalar ones.

The output is *fixed-shape batched arrays* ``(ne, nq_max, dim)`` points and
``(ne, nq_max)`` weights — empty slots carry zero weight — so downstream
integration is one masked ``sum(w · f(x))`` on device with no ragged
structures.  Rule construction is a host/setup product (exactly like the
reference, which builds rules element-by-element on the CPU).

Restriction: axis-aligned box elements (Cartesian meshes, arbitrary
spacing); the level set must cross each height line finitely often with
sign changes resolvable by the scan — smooth interfaces resolved by the
mesh, the same working assumption as the reference backends.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from .intrules import gauss_legendre_1d


def _cell_boxes(mesh) -> Tuple[np.ndarray, np.ndarray]:
    """(lo, hi) per element; axis-aligned boxes assumed."""
    X = mesh.vertices[mesh.elements]            # (ne, nv, dim)
    return X.min(axis=1), X.max(axis=1)


def _roots_lines(F: Callable, base: np.ndarray, a: float, b: float,
                 nscan: int, iters: int = 45):
    """Roots of t ↦ F(base_i, t) on [a,b] for every base point, batched.

    ``F(B, T)`` takes (n, k) base rows and (n,) heights → (n,) values.
    Returns (line_index array, root array) sorted by (line, root)."""
    nb = base.shape[0]
    ts = np.linspace(a, b, nscan + 1)
    B = np.repeat(base, nscan + 1, axis=0)
    T = np.tile(ts, nb)
    vals = np.asarray(F(B, T)).reshape(nb, nscan + 1)
    sgn = np.sign(vals)
    # zero values count as roots directly
    zl, zt = np.nonzero(vals == 0.0)
    cross = (sgn[:, :-1] * sgn[:, 1:]) < 0
    li, si = np.nonzero(cross)
    lo = ts[si].copy()
    hi = ts[si + 1].copy()
    flo = vals[li, si].copy()
    Bc = base[li]
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        fm = np.asarray(F(Bc, mid))
        left = flo * fm <= 0
        hi = np.where(left, mid, hi)
        lo = np.where(left, lo, mid)
        flo = np.where(left, flo, fm)
    roots_li = np.concatenate([li, zl])
    roots_t = np.concatenate([0.5 * (lo + hi), ts[zt]])
    order = np.lexsort((roots_t, roots_li))
    return roots_li[order], roots_t[order]


def _grad_batch(F: Callable, X: np.ndarray, h: float = 1e-6) -> np.ndarray:
    """Central-difference ∇φ at points X (n, dim), batched."""
    n, dim = X.shape
    G = np.zeros_like(X)
    for d in range(dim):
        E = np.zeros_like(X)
        E[:, d] = h
        G[:, d] = (np.asarray(F(X + E)) - np.asarray(F(X - E))) / (2 * h)
    return G


def _split_gauss_1d(a: float, b: float, breaks, xg, wg):
    """Gauss points on each sub-interval of [a,b] split at ``breaks``."""
    cuts = [a] + sorted(t for t in breaks if a + 1e-13 < t < b - 1e-13) + [b]
    pts, wts = [], []
    for i in range(len(cuts) - 1):
        ca, cb = cuts[i], cuts[i + 1]
        if cb - ca < 1e-14:
            continue
        pts.extend(ca + (cb - ca) * xg)
        wts.extend(wg * (cb - ca))
    return np.asarray(pts), np.asarray(wts)


def _base_quadtree_2d(sample_fn, rect, xg, wg, depth: int):
    """Tensor-Gauss base rule on ``rect``, quadtree-refined until the
    height-face level sets are sign-uniform on the leaf (3×3 lattice
    sample) or ``depth`` runs out.  ``sample_fn(P)`` → (npts, nfaces)."""
    (x0, x1), (y0, y1) = rect
    sx = np.linspace(x0, x1, 3)
    sy = np.linspace(y0, y1, 3)
    P9 = np.stack(np.meshgrid(sx, sy, indexing="ij"), axis=-1).reshape(-1, 2)
    vals = np.asarray(sample_fn(P9))            # (9, nfaces)
    uniform = not np.any((vals.min(axis=0) < 0) & (vals.max(axis=0) > 0))
    if uniform or depth == 0:
        gx = x0 + (x1 - x0) * xg
        gy = y0 + (y1 - y0) * xg
        P = np.stack([np.repeat(gx, len(gy)), np.tile(gy, len(gx))], axis=1)
        W = np.outer(wg * (x1 - x0), wg * (y1 - y0)).ravel()
        return [P], [W]
    xm, ym = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
    Ps, Ws = [], []
    for rx in ((x0, xm), (xm, x1)):
        for ry in ((y0, ym), (ym, y1)):
            p, w = _base_quadtree_2d(sample_fn, (rx, ry), xg, wg, depth - 1)
            Ps.extend(p)
            Ws.extend(w)
    return Ps, Ws


def _pad_batch(per_cell_pts: List[np.ndarray], per_cell_wts, dim: int):
    nq_max = max((len(w) for w in per_cell_wts), default=1) or 1
    ne = len(per_cell_wts)
    pts = np.zeros((ne, nq_max, dim))
    wts = np.zeros((ne, nq_max))
    for e, (p, w) in enumerate(zip(per_cell_pts, per_cell_wts)):
        if len(w):
            pts[e, :len(w)] = p
            wts[e, :len(w)] = w
    return pts, wts


def _embed(base_rows: np.ndarray, heights: np.ndarray, dim: int,
           hdir: int, odirs) -> np.ndarray:
    """Assemble (n, dim) physical points from base rows + heights."""
    X = np.zeros((len(heights), dim))
    for j, d in enumerate(odirs):
        X[:, d] = base_rows[:, j]
    X[:, hdir] = heights
    return X


def _base_rule(F, le, he, hdir, odirs, xg, wg, nscan, depth):
    """Base-direction quadrature (points (nb, dim-1), weights (nb,)) with
    root-count discontinuities resolved: exact face-crossing splits in 2D,
    quadtree refinement in 3D."""
    dim = len(le)
    a, b = le[hdir], he[hdir]
    if dim == 1:
        return np.zeros((1, 0)), np.ones(1)
    if dim == 2:
        # split the base at the interface's crossings of the two height
        # faces (where the per-line root count changes)
        d0 = odirs[0]
        breaks = []
        for face_t in (a, b):
            def Fface(_B, T, face_t=face_t):
                # parametrize the face by the base coordinate T (axis d0),
                # pinning the height axis at the face
                return F(_embed(T[:, None], np.full(len(T), face_t),
                                2, hdir, odirs))

            _, rts = _roots_lines(Fface, np.zeros((1, 1)),
                                  le[d0], he[d0], nscan)
            breaks += list(rts)
        p, w = _split_gauss_1d(le[d0], he[d0], breaks, xg, wg)
        return p[:, None], w
    # dim == 3: quadtree on the base square driven by the two height faces
    d0, d1 = odirs

    def sample_fn(P):
        out = np.zeros((len(P), 2))
        for k, t in enumerate((a, b)):
            X = np.zeros((len(P), 3))
            X[:, d0] = P[:, 0]
            X[:, d1] = P[:, 1]
            X[:, hdir] = t
            out[:, k] = np.asarray(F(X))
        return out

    Ps, Ws = _base_quadtree_2d(
        sample_fn, ((le[d0], he[d0]), (le[d1], he[d1])), xg, wg, depth)
    return np.concatenate(Ps), np.concatenate(Ws)


def cut_volume_rule(
    mesh, phi: Callable, order: int = 4, inside: str = "positive",
    max_roots: int = 4, nscan: Optional[int] = None, depth: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched rule for ∫_{φ>0} f dV (or φ<0 with ``inside='negative'``).

    Returns ``(points, weights)`` shaped ``(ne, nq_max, dim)`` /
    ``(ne, nq_max)``; unused slots carry zero weight.  Uncut cells reduce
    to the plain tensor-Gauss rule, empty cells to all-zero weights."""
    sign = 1.0 if inside == "positive" else -1.0
    F = lambda X: sign * np.asarray(phi(np.asarray(X)))
    lo, hi = _cell_boxes(mesh)
    ne, dim = lo.shape
    xg, wg = gauss_legendre_1d(order)
    nq = len(xg)
    nscan = nscan or max(8, 4 * order)
    all_p, all_w = [], []
    centers = 0.5 * (lo + hi)
    Gc = _grad_batch(F, centers)
    hdirs = np.argmax(np.abs(Gc), axis=1)
    for e in range(ne):
        le, he = lo[e], hi[e]
        hdir = int(hdirs[e])
        odirs = [d for d in range(dim) if d != hdir]
        base, bw = _base_rule(F, le, he, hdir, odirs, xg, wg, nscan, depth)
        a, b = le[hdir], he[hdir]

        def Fline(B, T):
            return F(_embed(B, T, dim, hdir, odirs))

        li, rt = _roots_lines(Fline, base, a, b, nscan)
        # per-line interval lists → candidate midpoints, classified batched
        ivals = []          # (line, ca, cb)
        for ib in range(len(base)):
            rts = rt[li == ib][:max_roots]
            cuts = [a] + list(rts) + [b]
            for iv in range(len(cuts) - 1):
                if cuts[iv + 1] - cuts[iv] > 1e-14:
                    ivals.append((ib, cuts[iv], cuts[iv + 1]))
        if not ivals:
            all_p.append(np.zeros((0, dim)))
            all_w.append(np.zeros(0))
            continue
        ivals = np.asarray(ivals)
        mids = 0.5 * (ivals[:, 1] + ivals[:, 2])
        keep = np.asarray(Fline(base[ivals[:, 0].astype(int)], mids)) > 0
        ivals = ivals[keep]
        if not len(ivals):
            all_p.append(np.zeros((0, dim)))
            all_w.append(np.zeros(0))
            continue
        ib = ivals[:, 0].astype(int)
        ca, cb = ivals[:, 1], ivals[:, 2]
        # Gauss points on every kept interval, vectorized
        H = (ca[:, None] + (cb - ca)[:, None] * xg[None, :]).ravel()
        Brows = np.repeat(base[ib], nq, axis=0)
        W = (bw[ib, None] * wg[None, :] * (cb - ca)[:, None]).ravel()
        all_p.append(_embed(Brows, H, dim, hdir, odirs))
        all_w.append(W)
    return _pad_batch(all_p, all_w, dim)


def cut_surface_rule(
    mesh, phi: Callable, order: int = 4, max_roots: int = 4,
    nscan: Optional[int] = None, depth: int = 5,
    grad_phi: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched rule for ∫_{φ=0} f dS.

    The interface is a height graph per (split) base region: at every base
    point the root x_h = y*(x_⊥) contributes weight
    ``w_⊥ · |∇φ| / |∂φ/∂x_h|`` — the surface-measure Jacobian of the graph
    map (Saye 2015, §3)."""
    F = lambda X: np.asarray(phi(np.asarray(X)))
    lo, hi = _cell_boxes(mesh)
    ne, dim = lo.shape
    xg, wg = gauss_legendre_1d(order)
    nscan = nscan or max(8, 4 * order)
    all_p, all_w = [], []
    centers = 0.5 * (lo + hi)
    hdirs = np.argmax(np.abs(_grad_batch(F, centers)), axis=1)
    for e in range(ne):
        le, he = lo[e], hi[e]
        hdir = int(hdirs[e])
        odirs = [d for d in range(dim) if d != hdir]
        base, bw = _base_rule(F, le, he, hdir, odirs, xg, wg, nscan, depth)
        a, b = le[hdir], he[hdir]

        def Fline(B, T):
            return F(_embed(B, T, dim, hdir, odirs))

        li, rt = _roots_lines(Fline, base, a, b, nscan)
        if not len(li):
            all_p.append(np.zeros((0, dim)))
            all_w.append(np.zeros(0))
            continue
        X = _embed(base[li], rt, dim, hdir, odirs)
        G = (np.asarray([grad_phi(x) for x in X]) if grad_phi is not None
             else _grad_batch(F, X))
        gh = np.abs(G[:, hdir])
        ok = gh > 1e-12
        W = np.where(ok, bw[li] * np.linalg.norm(G, axis=1) /
                     np.maximum(gh, 1e-300), 0.0)
        all_p.append(X[ok])
        all_w.append(W[ok])
    return _pad_batch(all_p, all_w, dim)


def integrate(points: np.ndarray, weights: np.ndarray,
              fn: Callable) -> float:
    """Masked sum  Σ_e Σ_q w_eq · f(x_eq)  (the subdomain/surface
    linear-form evaluation of ex38), accumulated in f64 — under jit,
    contract the (ne, nq_max) weights with field values directly instead."""
    vals = np.asarray(fn(np.asarray(points, np.float64)), np.float64)
    return float(np.sum(np.asarray(weights, np.float64) * vals))


def _basis_at_ref(geom, p: int, ref: np.ndarray) -> np.ndarray:
    """Nodal H1 basis values at per-element reference points
    (ne, nq, dim) → (ne, nq, nd), lattice dof order (the fespace order)."""
    from .basis import h1_nodes_1d, lagrange_matrices, lattice_multi_index

    mi = lattice_multi_index(geom, p)
    ne, nq, dim = ref.shape
    flat = ref.reshape(-1, dim)
    B1 = [lagrange_matrices(h1_nodes_1d(p), flat[:, d])[0]
          for d in range(dim)]                        # (ne*nq, p+1) each
    B = np.ones((flat.shape[0], len(mi)))
    for d in range(dim):
        B *= B1[d][:, mi[:, d]]
    return B.reshape(ne, nq, len(mi))


def cut_linear_form(fes, points: np.ndarray, weights: np.ndarray,
                    fn: Callable = None):
    """Assemble b_j = Σ_{e,q} w_eq f(x_eq) φ_j(x_eq) from a cut rule
    (``cut_volume_rule`` / ``cut_surface_rule``) — the linear forms ex38
    builds on implicit subdomains/interfaces.  Axis-aligned Cartesian
    elements (the rules' own restriction); returns a device L-vector."""
    import jax.numpy as jnp

    mesh = fes.mesh
    lo, hi = _cell_boxes(mesh)
    ref = (points - lo[:, None]) / (hi - lo)[:, None]
    B = _basis_at_ref(mesh.geom, fes.order, ref)       # (ne, nq, nd)
    fq = (np.ones(weights.shape) if fn is None
          else np.asarray(fn(points)))
    contrib = jnp.asarray(np.einsum("eq,eqn->en", weights * fq, B))
    out = jnp.zeros(fes.ndof_scalar, dtype=contrib.dtype)
    return out.at[jnp.asarray(np.asarray(fes.gather_map)).reshape(-1)].add(
        contrib.reshape(-1))
