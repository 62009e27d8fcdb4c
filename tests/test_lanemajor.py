"""Lane-major transposed apply (ops/lanemajor.py) vs the staged
sum-factorized path and vs FULL assembly.

Reference analog of the cross-check idiom:
``tests/unit/fem/test_assembly_levels.cpp`` (PA vs LEGACY agreement).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.mesh import (
    make_cartesian_2d,
    make_cartesian_2d_tri,
    make_cartesian_3d,
    make_cartesian_3d_tet,
)
from cardiac_ablation_ecm2_tpu.ops import BilinearForm
from cardiac_ablation_ecm2_tpu.utils.config import config, configure


def _mesh(dim, simplex=False):
    if dim == 2:
        return make_cartesian_2d_tri(3, 3) if simplex else make_cartesian_2d(3, 3)
    return make_cartesian_3d_tet(2, 2, 2) if simplex else make_cartesian_3d(2, 2, 2)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("kinds", [("mass",), ("diffusion",),
                                   ("mass", "diffusion")])
def test_lane_matches_staged(dim, order, kinds):
    fes = FESpace(_mesh(dim), order)
    rng = np.random.default_rng(42 + dim + order)
    x = jnp.asarray(rng.standard_normal(fes.ndof))

    def build():
        a = BilinearForm(fes)
        for k in kinds:
            a.add_domain_integrator(k, coeff=2.0 if k == "mass" else None)
        return a.assemble()

    old = config.lane_major
    try:
        configure(lane_major="auto")
        A_lane = build()
        assert A_lane.lane is not None, "lane path not engaged"
        y_lane = np.asarray(A_lane.mult(x))
        configure(lane_major="off")
        A_std = build()
        assert A_std.lane is None
        y_std = np.asarray(A_std.mult(x))
    finally:
        configure(lane_major=old)
    scale = np.abs(y_std).max()
    assert np.abs(y_lane - y_std).max() <= 1e-12 * scale


@pytest.mark.parametrize("order", [1, 2])
def test_lane_simplex_matches_full(order):
    """Non-tensor (tet) bases use db.B/db.G directly as the full matrices."""
    fes = FESpace(_mesh(3, simplex=True), order)
    a = BilinearForm(fes).add_domain_integrator("diffusion")
    A = a.assemble()
    assert A.lane is not None
    Afull = a.assemble_matrix()
    rng = np.random.default_rng(7)
    x = rng.standard_normal(fes.ndof)
    y = np.asarray(A.mult(jnp.asarray(x)))
    yref = Afull @ x
    assert np.abs(y - yref).max() <= 1e-10 * np.abs(yref).max()


def test_boundary_term_falls_back():
    """Robin boundary mass stays on the std path; sum still matches FULL."""
    fes = FESpace(_mesh(2), 2)
    a = (BilinearForm(fes)
         .add_domain_integrator("diffusion")
         .add_boundary_integrator("mass", coeff=3.0))
    A = a.assemble()
    assert A.lane is not None and len(A.std_terms) == 1
    Afull = a.assemble_matrix()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(fes.ndof)
    y = np.asarray(A.mult(jnp.asarray(x)))
    yref = Afull @ x
    assert np.abs(y - yref).max() <= 1e-10 * np.abs(yref).max()


def test_bioheat_lane_on_tets():
    """BioheatOperator's transposed apply now engages on simplex meshes."""
    from cardiac_ablation_ecm2_tpu.models.bioheat import BioheatOperator

    fes = FESpace(_mesh(3, simplex=True), 2)
    op = BioheatOperator(fes, rho_c=1.0, k=1.0, ess_bdr=[1, 2, 3, 4, 5, 6])
    assert op._lane is not None
    op_ref = BioheatOperator(fes, rho_c=1.0, k=1.0,
                             ess_bdr=[1, 2, 3, 4, 5, 6],
                             transposed_apply=False)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(fes.ndof))
    y1 = np.asarray(op._implicit_lhs_apply(0.3, v))
    y2 = np.asarray(op_ref._implicit_lhs_apply(0.3, v))
    assert np.abs(y1 - y2).max() <= 1e-11 * np.abs(y2).max()
