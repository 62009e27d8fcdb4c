"""Bucketed multi-ELL SpMV (ops/ell.MultiELLOperator).

Variable-row-width matrices (higher-order simplex stencils) as permuted
nnz-bucketed weighted-gather slabs; y = A x must match scipy exactly up to
f32 rounding, including the row permutation round trip.
"""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from cardiac_ablation_ecm2_tpu.ops.ell import MultiELLOperator


def _random_varwidth(n=700, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for r in range(n):
        # heavy-tailed row widths: mostly 5-20, a few up to 90
        k = int(rng.integers(3, 20))
        if rng.random() < 0.05:
            k = int(rng.integers(40, 90))
        c = rng.choice(n, size=min(k, n), replace=False)
        v = rng.standard_normal(len(c))
        rows += [r] * len(c)
        cols += list(c)
        vals += list(v)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


def test_multi_ell_matches_scipy():
    A = _random_varwidth()
    op = MultiELLOperator.from_csr(A, dtype="float64")
    x = np.random.default_rng(1).standard_normal(A.shape[0])
    y = np.asarray(op.mult(jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.diag), A.diagonal(), rtol=1e-12)


def test_multi_ell_fem_matrix():
    import jax

    from cardiac_ablation_ecm2_tpu.fem import FESpace
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d_tet
    from cardiac_ablation_ecm2_tpu.ops.bilinearform import BilinearForm

    mesh = make_cartesian_3d_tet(4, 4, 4)
    fes = FESpace(mesh, 2)
    A = BilinearForm(fes).add_domain_integrator(
        "diffusion").assemble_matrix()
    op = MultiELLOperator.from_csr(A, dtype="float64")
    x = np.random.default_rng(2).standard_normal(A.shape[0])
    y = np.asarray(op.mult(jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-11, atol=1e-11)
