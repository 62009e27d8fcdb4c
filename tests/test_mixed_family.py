"""The cross/dot/directional mixed-integrator family
(MixedDotProduct / MixedVectorProduct / MixedCrossProduct /
MixedScalarCrossProduct / MixedDirectionalDerivative / MixedGradGrad /
MixedCrossGradGrad analogs, ops/mixed_vecfe.py) — validated by exact
polynomial quadrature identities and adjoint/antisymmetry structure."""

import jax.numpy as jnp
import numpy as np

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_2d, make_cartesian_3d
from cardiac_ablation_ecm2_tpu.ops import BilinearForm
from cardiac_ablation_ecm2_tpu.ops.linearform import domain_lf, domain_lf_vector
from cardiac_ablation_ecm2_tpu.ops.mixed_vecfe import (
    mixed_cross_grad_grad, mixed_cross_product, mixed_directional_derivative,
    mixed_dot_product, mixed_grad_grad, mixed_scalar_cross_product,
    mixed_vector_product)


def _interp_vec(vfes, fns):
    X = np.asarray(vfes.dof_coords)
    return jnp.asarray(np.concatenate([f(X) for f in fns]))


def test_dot_product_polynomial():
    mesh = make_cartesian_2d(3, 3)
    V2 = FESpace(mesh, 2, vdim=2)
    Q = FESpace(mesh, 2)
    V = np.array([2.0, 3.0])
    op = mixed_dot_product(V2, Q, V)
    u = _interp_vec(V2, [lambda X: X[:, 0] ** 2, lambda X: X[:, 0] * X[:, 1]])
    got = np.asarray(op.mult(u))
    want = np.asarray(domain_lf(
        Q, lambda x: 2 * x[..., 0] ** 2 + 3 * x[..., 0] * x[..., 1],
        nq1d=4))
    assert np.allclose(got, want, atol=1e-13)


def test_vector_product_is_dot_adjoint():
    mesh = make_cartesian_2d(3, 3)
    V2 = FESpace(mesh, 2, vdim=2)
    Q = FESpace(mesh, 1)
    V = np.array([0.7, -1.3])
    dot_op = mixed_dot_product(V2, Q, V)
    vp_op = mixed_vector_product(Q, V2, V)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(V2.ndof))
    q = jnp.asarray(rng.standard_normal(Q.ndof_scalar))
    a = float(dot_op.mult(u) @ q)
    b = float(u @ vp_op.mult(q))
    assert abs(a - b) < 1e-12 * max(abs(a), 1.0)


def test_scalar_cross_product_polynomial():
    mesh = make_cartesian_2d(3, 3)
    V2 = FESpace(mesh, 2, vdim=2)
    Q = FESpace(mesh, 2)
    V = np.array([2.0, 3.0])
    op = mixed_scalar_cross_product(V2, Q, V)
    u = _interp_vec(V2, [lambda X: X[:, 0] ** 2, lambda X: X[:, 0] * X[:, 1]])
    # V × u = V_x u_y − V_y u_x = 2xy − 3x²
    got = np.asarray(op.mult(u))
    want = np.asarray(domain_lf(
        Q, lambda x: 2 * x[..., 0] * x[..., 1] - 3 * x[..., 0] ** 2,
        nq1d=4))
    assert np.allclose(got, want, atol=1e-13)


def test_cross_product_3d_polynomial():
    mesh = make_cartesian_3d(2, 2, 2)
    V3 = FESpace(mesh, 1, vdim=3)
    V = np.array([1.0, 2.0, 3.0])
    op = mixed_cross_product(V3, V3, V)
    u = _interp_vec(V3, [lambda X: X[:, 2], lambda X: X[:, 0],
                         lambda X: X[:, 1]])
    got = np.asarray(op.mult(u))
    want = np.asarray(domain_lf_vector(
        V3, lambda x: np.stack([
            2 * x[..., 1] - 3 * x[..., 0],
            3 * x[..., 2] - 1 * x[..., 1],
            1 * x[..., 0] - 2 * x[..., 2]], axis=-1), nq1d=3))
    assert np.allclose(got, want, atol=1e-13)


def test_directional_derivative_polynomial():
    mesh = make_cartesian_2d(3, 3)
    S = FESpace(mesh, 2)
    Q = FESpace(mesh, 1)
    V = np.array([2.0, 3.0])
    op = mixed_directional_derivative(S, Q, V)
    X = np.asarray(S.dof_coords)
    u = jnp.asarray(X[:, 0] ** 2 + X[:, 1])
    got = np.asarray(op.mult(u))
    want = np.asarray(domain_lf(Q, lambda x: 4 * x[..., 0] + 3.0, nq1d=4))
    assert np.allclose(got, want, atol=1e-13)


def test_grad_grad_matches_diffusion():
    mesh = make_cartesian_2d(3, 3)
    S = FESpace(mesh, 2)
    M = mixed_grad_grad(S, S, coeff=1.7).assemble_matrix()
    A = BilinearForm(S, nq1d=4).add_domain_integrator(
        "diffusion", coeff=1.7).assemble_matrix()
    assert abs(M - A).max() < 1e-12


def test_cross_grad_grad_antisymmetric():
    mesh = make_cartesian_3d(2, 2, 2)
    S = FESpace(mesh, 2)
    V = np.array([0.4, -1.1, 0.8])
    op = mixed_cross_grad_grad(S, S, V)
    M = op.assemble_matrix().toarray()
    assert np.abs(M + M.T).max() < 1e-13
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(S.ndof_scalar))
    assert abs(float(op.mult(u) @ u)) < 1e-11
