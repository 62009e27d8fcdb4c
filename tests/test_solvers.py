"""Krylov solver catalog tests (reference analog: tests/unit/linalg/):
GMRES on nonsymmetric, MINRES on indefinite (test_cg_indefinite analog),
BiCGStab, and LOBPCG eigenvalues vs analytic Laplace spectrum (ex11)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.linalg.krylov_extra import bicgstab, minres
from cardiac_ablation_ecm2_tpu.linalg.lobpcg import lobpcg
from cardiac_ablation_ecm2_tpu.linalg.solvers import cg, gmres
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_2d
from cardiac_ablation_ecm2_tpu.ops import BilinearForm, ConstrainedOperator


def _rand_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.random((n, n)))
    d = np.linspace(1.0, 50.0, n)
    return Q @ np.diag(d) @ Q.T


def test_gmres_nonsymmetric():
    n = 40
    rng = np.random.default_rng(1)
    Anp = np.eye(n) * 5 + rng.random((n, n))
    b = rng.random(n)
    A = lambda x: jnp.asarray(Anp) @ x
    x, info = gmres(A, jnp.asarray(b), rel_tol=1e-12, restart=20, max_iter=200)
    assert bool(info.converged)
    assert np.allclose(np.asarray(A(x)), b, atol=1e-8)


def test_minres_indefinite():
    n = 30
    Anp = _rand_spd(n, 2)
    Anp[:10] *= -1.0
    Anp = 0.5 * (Anp + Anp.T)  # symmetric indefinite
    rng = np.random.default_rng(3)
    b = rng.random(n)
    A = lambda x: jnp.asarray(Anp) @ x
    x, info = minres(A, jnp.asarray(b), rel_tol=1e-11, max_iter=300)
    assert bool(info.converged)
    assert np.allclose(Anp @ np.asarray(x), b, atol=1e-7)


def test_bicgstab():
    n = 40
    rng = np.random.default_rng(4)
    Anp = np.eye(n) * 4 + 0.5 * rng.random((n, n))
    b = rng.random(n)
    A = lambda x: jnp.asarray(Anp) @ x
    x, info = bicgstab(A, jnp.asarray(b), rel_tol=1e-12, max_iter=300)
    assert bool(info.converged)
    assert np.allclose(Anp @ np.asarray(x), b, atol=1e-8)


def test_lobpcg_laplace_eigenvalues():
    """ex11: smallest Dirichlet Laplace eigenvalues on the unit square are
    π²(i²+j²): 2π², 5π², 5π², 8π²..."""
    mesh = make_cartesian_2d(12, 12)
    fes = FESpace(mesh, 2)
    ess = fes.essential_dofs()
    A_pa = BilinearForm(fes).add_domain_integrator("diffusion").assemble()
    M_pa = BilinearForm(fes).add_domain_integrator("mass").assemble()
    Ac = ConstrainedOperator.wrap(A_pa.operator(), ess)

    essj = jnp.asarray(ess)

    def proj(v):
        return v.at[essj].set(0.0)

    def Aop(v):
        return Ac.mult(v)

    def Mop(v):
        return proj(M_pa.mult(proj(v)))

    diag = Ac.diagonal()
    prec = lambda r: r / diag
    res = lobpcg(Aop, Mop, fes.ndof, k=5, precond=prec, iters=60,
                 constraint=proj)
    lam = np.sort(np.asarray(res.eigenvalues))[:4]
    pi2 = np.pi**2
    exact = np.array([2, 5, 5, 8]) * pi2
    assert np.allclose(lam, exact, rtol=2e-3), (lam / pi2, exact / pi2)
