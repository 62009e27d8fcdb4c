"""Two-body tied / sliding / contact interfaces (mortar node-to-segment).

Reference analog: miniapps/contact (Tribol mortar pairing) + the tied-
interface use of linalg/constraints.hpp.  Covers:
  * tied MATCHING interface == conforming single-mesh solve (exact),
  * tied NON-matching interface: slave-node continuity exact, global
    solution close to the conforming overlay,
  * two-body frictionless contact via PDAS: gap closure, non-penetration,
    nonnegative pressure, complementarity."""

import jax.numpy as jnp
import numpy as np

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.fem.mortar import (build_tie_constraints,
                                                  contact_solve)
from cardiac_ablation_ecm2_tpu.linalg.constrained import (
    eliminate_constrained_solve)
from cardiac_ablation_ecm2_tpu.linalg.solvers import cg
from cardiac_ablation_ecm2_tpu.mesh import Mesh, make_cartesian_2d
from cardiac_ablation_ecm2_tpu.ops import BilinearForm
from cardiac_ablation_ecm2_tpu.ops.linearform import boundary_lf_vector


def two_body_mesh(nx_lo=4, nx_hi=4, ny=4, gap=0.0):
    """Two unit blocks: lower [0,1]², upper [0,1]×[1+gap, 2+gap], separate
    node sets.  Attrs: 1 lower-bottom, 8 lower-top (master), 7 upper-bottom
    (slave), 3 upper-top, sides keep 2/4 (lower) and 12/14 (upper)."""
    lo = make_cartesian_2d(nx_lo, ny)
    hi = make_cartesian_2d(nx_hi, ny)
    nvlo = lo.vertices.shape[0]
    Vhi = hi.vertices.copy()
    Vhi[:, 1] += 1.0 + gap
    att_lo = lo.bdr_attributes.copy()
    att_lo[att_lo == 3] = 8
    att_hi = hi.bdr_attributes.copy()
    att_hi[att_hi == 1] = 7
    att_hi[att_hi == 2] = 12
    att_hi[att_hi == 4] = 14
    return Mesh(
        geom=lo.geom,
        vertices=np.concatenate([lo.vertices, Vhi]),
        elements=np.concatenate([lo.elements, hi.elements + nvlo]),
        attributes=np.concatenate([lo.attributes, hi.attributes + 1]),
        boundary=np.concatenate([lo.boundary, hi.boundary + nvlo]),
        bdr_attributes=np.concatenate([att_lo, att_hi]))


def _solve_tied(mesh, order, load=-0.05):
    fes = FESpace(mesh, order, vdim=2)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    b = boundary_lf_vector(fes, np.array([0.0, load]), bdr_marker=[3])
    ess = fes.essential_dofs([1])
    fm = jnp.zeros(fes.ndof).at[
        jnp.asarray(np.concatenate([ess, ess + ns]))].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    pair = build_tie_constraints(fes, [7], [8], max_pair_dist=0.3)
    diag = A.diagonal() * free + fm
    u, lam, info = eliminate_constrained_solve(
        A_bc, pair.B, b * free, M=lambda v: v / diag, rel_tol=1e-12,
        max_iter=6000)
    assert bool(info.converged)
    return fes, u, pair


def _conforming_reference(nx, ny2, order, load=-0.05):
    mesh = make_cartesian_2d(nx, ny2, 1.0, 2.0)
    fes = FESpace(mesh, order, vdim=2)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    b = boundary_lf_vector(fes, np.array([0.0, load]), bdr_marker=[3])
    ess = fes.essential_dofs([1])
    fm = jnp.zeros(fes.ndof).at[
        jnp.asarray(np.concatenate([ess, ess + ns]))].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    diag = A.diagonal() * free + fm
    u, info = cg(A_bc, b * free, M=lambda v: v / diag, rel_tol=1e-12,
                 max_iter=6000)
    assert bool(info.converged)
    return fes, u


def _by_coord(fes, u):
    """{rounded node coord: (ux, uy)} for cross-mesh comparison."""
    ns = fes.ndof_scalar
    un = np.asarray(u)
    out = {}
    for d, x in enumerate(np.asarray(fes.dof_coords)):
        out[tuple(np.round(x, 9))] = (un[d], un[d + ns])
    return out


def test_tied_matching_equals_conforming():
    """Matching interface grids: the tied two-body solve IS the conforming
    problem with interface dofs identified — solutions agree to solver
    tolerance at every shared node."""
    mesh = two_body_mesh(4, 4, 4)
    fes, u, pair = _solve_tied(mesh, order=1)
    # every slave node paired, one row per component
    assert pair.B.m == 2 * (4 + 1)
    assert float(jnp.abs(pair.B.mult(u)).max()) < 1e-10

    fes_c, u_c = _conforming_reference(4, 8, order=1)
    got = _by_coord(fes, u)
    ref = _by_coord(fes_c, u_c)
    scale = np.abs(np.asarray(u_c)).max()
    for x, v in ref.items():
        assert x in got
        assert np.allclose(got[x], v, atol=1e-8 * scale), (x, got[x], v)


def test_tied_nonmatching_mortar():
    """Non-matching interface (slave 5 segments vs master 3): slave-node
    continuity is exact (collocation), the global field tracks the
    conforming overlay closely, and interface tractions balance."""
    mesh = two_body_mesh(nx_lo=3, nx_hi=5, ny=3)
    fes, u, pair = _solve_tied(mesh, order=1)
    assert pair.B.m == 2 * (5 + 1)
    assert float(jnp.abs(pair.B.mult(u)).max()) < 1e-10

    # compare against a fine conforming reference at the coarse nodes
    fes_c, u_c = _conforming_reference(15, 30, order=1)
    ref = _by_coord(fes_c, u_c)
    got = _by_coord(fes, u)
    scale = np.abs(np.asarray(u_c)).max()
    errs = [np.abs(np.asarray(got[x]) - np.asarray(v))
            for x, v in got.items() if x in ref
            for v in [ref[x]]]
    assert np.max(errs) < 0.05 * scale


def test_two_body_contact_pdas():
    """Upper block pressed down onto the lower across an initial gap."""
    gap = 0.02
    mesh = two_body_mesh(4, 4, 4, gap=gap)
    fes = FESpace(mesh, 1, vdim=2)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()

    ess_lo = fes.essential_dofs([1])       # clamp lower bottom
    ess_hi = fes.essential_dofs([3])       # drive upper top down
    fixed = np.concatenate([ess_lo, ess_lo + ns, ess_hi, ess_hi + ns])
    fm = jnp.zeros(fes.ndof).at[jnp.asarray(fixed)].set(1.0)

    pair = build_tie_constraints(fes, [7], [8], normal_only=True,
                                 max_pair_dist=0.3)
    assert pair.B.m == 5
    assert np.allclose(pair.gaps, gap, atol=1e-12)
    # master outward normal points from lower body up toward the slave
    assert np.allclose(pair.normals, [0.0, 1.0], atol=1e-12)

    def drive(delta):
        fv = jnp.zeros(fes.ndof).at[jnp.asarray(ess_hi + ns)].set(-delta)
        return contact_solve(
            A.mult, pair, jnp.zeros(fes.ndof), diag=A.diagonal(),
            fixed_mask=fm, fixed_vals=fv, rel_tol=1e-12)

    # small push: gap stays open, no contact forces, rigid translation
    u0, lam0, it0 = drive(0.01)
    assert float(jnp.abs(lam0).max()) == 0.0
    g0 = pair.gaps + np.asarray(pair.B.mult(u0))
    assert g0.min() > 1e-3
    uy_hi = np.asarray(u0[ns:])[fes.essential_dofs([7])]
    assert np.allclose(uy_hi, -0.01, atol=1e-9)

    # big push: contact closes the gap
    u1, lam1, it1 = drive(0.05)
    assert it1 < 30
    g1 = pair.gaps + np.asarray(pair.B.mult(u1))
    assert g1.min() > -1e-9                      # non-penetration
    assert np.asarray(lam1).min() > -1e-9        # pressure >= 0
    assert float(np.abs(np.asarray(lam1) * g1).max()) < 1e-8
    assert np.asarray(lam1).max() > 1e-4         # real contact happened
    # lower block's top surface is pushed down
    top_lo = fes.essential_dofs([8])
    assert np.asarray(u1[ns:])[top_lo].mean() < -1e-4


def _patch_setup(nx_lo, nx_hi, ny, t_load=0.08):
    """Uniform uniaxial compression with exact linear solution
    u = (t/8 x, -3t/8 y) for lambda = mu = 1 (plane strain):
    clamp uy on the lower bottom, ux on both left edges, traction
    (0, -t) on the upper top; sides traction-free."""
    mesh = two_body_mesh(nx_lo, nx_hi, ny)
    fes = FESpace(mesh, 1, vdim=2)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    b = boundary_lf_vector(fes, np.array([0.0, -t_load]), bdr_marker=[3])
    bot = fes.essential_dofs([1])
    left = np.concatenate([fes.essential_dofs([4]),
                           fes.essential_dofs([14])])
    fixed = np.concatenate([bot + ns, left])
    fm = jnp.zeros(fes.ndof).at[jnp.asarray(fixed)].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    diag = A.diagonal() * free + fm
    X = np.asarray(fes.dof_coords)
    exact = np.concatenate([t_load / 8 * X[:, 0], -3 * t_load / 8 * X[:, 1]])
    return fes, A_bc, b * free, diag, exact


def test_mortar_passes_patch_test_where_collocation_fails():
    """Segment-integrated mortar transmits constant stress exactly across
    the non-matching interface (exact linear solution to solver tol);
    node-to-segment collocation demonstrably does not."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints

    fes, A_bc, b, diag, exact = _patch_setup(3, 5, 3)
    errs = {}
    for name, builder in (("mortar", build_mortar_constraints),
                          ("collocation", build_tie_constraints)):
        pair = builder(fes, [7], [8], max_pair_dist=0.3)
        u, lam, info = eliminate_constrained_solve(
            A_bc, pair.B, b, M=lambda v: v / diag, rel_tol=1e-13,
            max_iter=8000)
        assert bool(info.converged)
        errs[name] = float(np.abs(np.asarray(u) - exact).max())
    scale = np.abs(exact).max()
    assert errs["mortar"] < 1e-9 * scale, errs
    assert errs["collocation"] > 100 * errs["mortar"], errs


def test_mortar_matching_equals_conforming():
    """On matching grids the mortar coupling reproduces the conforming
    solution too (same as collocation there)."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints

    fes, A_bc, b, diag, exact = _patch_setup(4, 4, 4)
    pair = build_mortar_constraints(fes, [7], [8], max_pair_dist=0.3)
    u, _, info = eliminate_constrained_solve(
        A_bc, pair.B, b, M=lambda v: v / diag, rel_tol=1e-13, max_iter=8000)
    assert bool(info.converged)
    err = float(np.abs(np.asarray(u) - exact).max())
    assert err < 1e-9 * np.abs(exact).max(), err


def test_mortar_3d_patch_test():
    """3D two-body tied interface with NON-matching quad grids: the
    tensor-split mortar integration transmits constant uniaxial stress
    exactly (u = (a x, a y, -4a z), a = t/10 for lambda = mu = 1)."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
    from cardiac_ablation_ecm2_tpu.ops.linearform import boundary_lf_vector

    nlo, nhi, nz = 3, 2, 2
    lo = make_cartesian_3d(nlo, nlo, nz)
    hi = make_cartesian_3d(nhi, nhi, nz)
    Vhi = hi.vertices.copy()
    Vhi[:, 2] += 1.0
    att_lo = lo.bdr_attributes.copy()
    att_lo[att_lo == 6] = 8                        # lower top = master
    att_hi = hi.bdr_attributes.copy() + 10
    att_hi[att_hi == 11] = 7                       # upper bottom = slave
    mesh = Mesh(
        geom=lo.geom,
        vertices=np.concatenate([lo.vertices, Vhi]),
        elements=np.concatenate([lo.elements,
                                 hi.elements + lo.vertices.shape[0]]),
        attributes=np.concatenate([lo.attributes, hi.attributes + 1]),
        boundary=np.concatenate([lo.boundary,
                                 hi.boundary + lo.vertices.shape[0]]),
        bdr_attributes=np.concatenate([att_lo, att_hi]))

    fes = FESpace(mesh, 1, vdim=3)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    t = 0.08
    b = boundary_lf_vector(fes, np.array([0.0, 0.0, -t]), bdr_marker=[16])

    # symmetry BCs: uz=0 at z=0 (1), ux=0 at x=0 (5, 15), uy=0 at y=0 (2, 12)
    fixed = np.concatenate([
        fes.essential_dofs([1]) + 2 * ns,
        fes.essential_dofs([5]), fes.essential_dofs([15]),
        fes.essential_dofs([2]) + ns, fes.essential_dofs([12]) + ns])
    fm = jnp.zeros(fes.ndof).at[jnp.asarray(np.unique(fixed))].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    pair = build_mortar_constraints(fes, [7], [8], max_pair_dist=0.4)
    diag = A.diagonal() * free + fm
    u, lam, info = eliminate_constrained_solve(
        A_bc, pair.B, b * free, M=lambda v: v / diag, rel_tol=1e-13,
        max_iter=10000)
    assert bool(info.converged)

    X = np.asarray(fes.dof_coords)
    a = t / 10
    exact = np.concatenate([a * X[:, 0], a * X[:, 1], -4 * a * X[:, 2]])
    err = np.abs(np.asarray(u) - exact).max()
    assert err < 1e-9 * np.abs(exact).max(), err


def test_mortar_patch_test_order2():
    """Order-2 non-matching mortar is also patch-test exact (quadratic
    trace products integrated exactly on the mortar segments)."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints

    fes, A_bc, b, diag, exact = _patch_setup(3, 5, 3)
    mesh = fes.mesh
    fes2 = FESpace(mesh, 2, vdim=2)
    ns = fes2.ndof_scalar
    A = BilinearForm(fes2).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    t_load = 0.08
    b2 = boundary_lf_vector(fes2, np.array([0.0, -t_load]), bdr_marker=[3])
    bot = fes2.essential_dofs([1])
    left = np.concatenate([fes2.essential_dofs([4]),
                           fes2.essential_dofs([14])])
    fm = jnp.zeros(fes2.ndof).at[
        jnp.asarray(np.concatenate([bot + ns, left]))].set(1.0)
    free = 1.0 - fm

    def A_bc2(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    pair = build_mortar_constraints(fes2, [7], [8], max_pair_dist=0.3)
    diag2 = A.diagonal() * free + fm
    u, _, info = eliminate_constrained_solve(
        A_bc2, pair.B, b2 * free, M=lambda v: v / diag2, rel_tol=1e-13,
        max_iter=12000)
    assert bool(info.converged)
    X = np.asarray(fes2.dof_coords)
    exact2 = np.concatenate([t_load / 8 * X[:, 0], -3 * t_load / 8 * X[:, 1]])
    err = np.abs(np.asarray(u) - exact2).max()
    assert err < 1e-9 * np.abs(exact2).max(), err


def test_mortar_tet_matching_interface():
    """Tied interface between two TET blocks (triangle boundary faces,
    matching grids): mortar coupling reproduces the conforming solution —
    the cardiac-relevant element type."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d_tet
    from cardiac_ablation_ecm2_tpu.ops.linearform import boundary_lf_vector

    n = 2
    lo = make_cartesian_3d_tet(n, n, n)
    hi = make_cartesian_3d_tet(n, n, n)
    Vhi = hi.vertices.copy()
    Vhi[:, 2] += 1.0
    att_lo = lo.bdr_attributes.copy()
    att_lo[att_lo == 6] = 8
    att_hi = hi.bdr_attributes.copy() + 10
    att_hi[att_hi == 11] = 7
    mesh = Mesh(
        geom=lo.geom,
        vertices=np.concatenate([lo.vertices, Vhi]),
        elements=np.concatenate([lo.elements,
                                 hi.elements + lo.vertices.shape[0]]),
        attributes=np.concatenate([lo.attributes, hi.attributes + 1]),
        boundary=np.concatenate([lo.boundary,
                                 hi.boundary + lo.vertices.shape[0]]),
        bdr_attributes=np.concatenate([att_lo, att_hi]))
    fes = FESpace(mesh, 1, vdim=3)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    t = 0.05
    b = boundary_lf_vector(fes, np.array([0.0, 0.0, -t]), bdr_marker=[16])
    fixed = np.concatenate([
        fes.essential_dofs([1]) + 2 * ns,
        fes.essential_dofs([5]), fes.essential_dofs([15]),
        fes.essential_dofs([2]) + ns, fes.essential_dofs([12]) + ns])
    fm = jnp.zeros(fes.ndof).at[jnp.asarray(np.unique(fixed))].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    pair = build_mortar_constraints(fes, [7], [8], max_pair_dist=0.4)
    diag = A.diagonal() * free + fm
    u, _, info = eliminate_constrained_solve(
        A_bc, pair.B, b * free, M=lambda v: v / diag, rel_tol=1e-13,
        max_iter=12000)
    assert bool(info.converged)
    # matching grids + tied: uniaxial patch solution is exact here too
    X = np.asarray(fes.dof_coords)
    a = t / 10
    exact = np.concatenate([a * X[:, 0], a * X[:, 1], -4 * a * X[:, 2]])
    err = np.abs(np.asarray(u) - exact).max()
    assert err < 1e-9 * np.abs(exact).max(), err


def test_mortar_tet_nonmatching_patch_test():
    """3D tet-tet NON-matching tied interface (different grid sizes AND
    diagonal patterns): the triangle-slave mortar segmentation — master
    faces clipped against each slave face, per-cell Gauss — transmits
    constant uniaxial stress exactly (VERDICT r3 item 8; previously the
    plain high-order rule was only first-order across the kinks)."""
    from cardiac_ablation_ecm2_tpu.fem.mortar import build_mortar_constraints
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d_tet
    from cardiac_ablation_ecm2_tpu.ops.linearform import boundary_lf_vector

    nlo, nhi, nz = 3, 2, 2
    lo = make_cartesian_3d_tet(nlo, nlo, nz)
    hi = make_cartesian_3d_tet(nhi, nhi, nz)
    Vhi = hi.vertices.copy()
    Vhi[:, 2] += 1.0
    att_lo = lo.bdr_attributes.copy()
    att_lo[att_lo == 6] = 8
    att_hi = hi.bdr_attributes.copy() + 10
    att_hi[att_hi == 11] = 7
    mesh = Mesh(
        geom=lo.geom,
        vertices=np.concatenate([lo.vertices, Vhi]),
        elements=np.concatenate([lo.elements,
                                 hi.elements + lo.vertices.shape[0]]),
        attributes=np.concatenate([lo.attributes, hi.attributes + 1]),
        boundary=np.concatenate([lo.boundary,
                                 hi.boundary + lo.vertices.shape[0]]),
        bdr_attributes=np.concatenate([att_lo, att_hi]))
    fes = FESpace(mesh, 1, vdim=3)
    ns = fes.ndof_scalar
    A = BilinearForm(fes).add_domain_integrator(
        "elasticity", coeff=(1.0, 1.0)).assemble()
    t = 0.05
    b = boundary_lf_vector(fes, np.array([0.0, 0.0, -t]), bdr_marker=[16])
    fixed = np.concatenate([
        fes.essential_dofs([1]) + 2 * ns,
        fes.essential_dofs([5]), fes.essential_dofs([15]),
        fes.essential_dofs([2]) + ns, fes.essential_dofs([12]) + ns])
    fm = jnp.zeros(fes.ndof).at[jnp.asarray(np.unique(fixed))].set(1.0)
    free = 1.0 - fm

    def A_bc(v):
        z = v * free
        return A.mult(z) * free + (v - z)

    pair = build_mortar_constraints(fes, [7], [8], max_pair_dist=0.4)
    diag = A.diagonal() * free + fm
    u, _, info = eliminate_constrained_solve(
        A_bc, pair.B, b * free, M=lambda v: v / diag, rel_tol=1e-13,
        max_iter=12000)
    assert bool(info.converged)
    X = np.asarray(fes.dof_coords)
    a = t / 10
    exact = np.concatenate([a * X[:, 0], a * X[:, 1], -4 * a * X[:, 2]])
    err = np.abs(np.asarray(u) - exact).max()
    assert err < 1e-9 * np.abs(exact).max(), err
