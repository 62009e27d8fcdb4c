"""Vector-FE linear forms against derivative bases.

VectorFEDomainLFCurl (f, curl v) and VectorFEDomainLFDiv (f, div v)
(reference fem/lininteg.hpp:393/:417), validated by the duality identity
b·x_E = ∫ f · curl(E_h) (resp. ∫ f div F_h) with E_h an exact L2
projection of a representable polynomial field, so the integral has a
closed form.
"""

import numpy as np
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.fem.fe_vector import NDSpace, RTSpace
from cardiac_ablation_ecm2_tpu.linalg.solvers import cg
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
from cardiac_ablation_ecm2_tpu.ops.vecfe import (
    build_nd_operator,
    build_rt_operator,
    vecfe_linear_form,
    vecfe_linear_form_curl,
    vecfe_linear_form_div,
)


def l2_project(op, field):
    b = vecfe_linear_form(op, field)
    x, info = cg(op.mult, b, M=lambda r: r / op.diagonal(),
                 rel_tol=1e-13, max_iter=2000)
    assert info.converged
    return x


def test_curl_linear_form_duality():
    mesh = make_cartesian_3d(3, 3, 3)
    sp = NDSpace(mesh)
    M = build_nd_operator(sp, mass_coeff=1.0)
    A = build_nd_operator(sp, mass_coeff=1.0, curlcurl_coeff=1.0)

    # E = (yz, 0, 0) is in ND0 on hexes; curl E = (0, y, -z)
    def E(x):
        out = np.zeros_like(x)
        out[..., 0] = x[..., 1] * x[..., 2]
        return out

    xE = l2_project(M, E)
    f = np.array([1.0, 2.0, 3.0])
    b = vecfe_linear_form_curl(A, lambda x: np.broadcast_to(f, x.shape))
    # ∫ f·curl E over unit cube = 2*∫y - 3*∫z = 2*(1/2) - 3*(1/2) = -1/2
    got = float(jnp.dot(b, xE))
    assert abs(got - (-0.5)) < 1e-10


def test_div_linear_form_duality():
    mesh = make_cartesian_3d(3, 3, 3)
    sp = RTSpace(mesh)
    M = build_rt_operator(sp, mass_coeff=1.0)
    A = build_rt_operator(sp, mass_coeff=1.0, divdiv_coeff=1.0)

    # F = (x, y, z) is in RT0 on hexes; div F = 3
    def F(x):
        return np.asarray(x)

    xF = l2_project(M, F)
    b = vecfe_linear_form_div(A, lambda x: np.asarray(x)[..., 0])
    # ∫ x * div F = 3 * ∫x = 3/2 over the unit cube
    got = float(jnp.dot(b, xF))
    assert abs(got - 1.5) < 1e-10


def test_missing_term_raises():
    mesh = make_cartesian_3d(2, 2, 2)
    sp = NDSpace(mesh)
    M = build_nd_operator(sp, mass_coeff=1.0)
    try:
        vecfe_linear_form_curl(M, lambda x: x)
    except ValueError as e:
        assert "curlcurl" in str(e)
    else:
        raise AssertionError("expected ValueError")
