"""CG-iteration-count parity with MFEM (BASELINE.json metric 2).

Golden values generated 2026-08-16 with a driver built against the reference
library (libmfem.a): Poisson −Δu = 1, u = 0 on all boundary attributes,
PARTIAL assembly, OperatorJacobiSmoother-preconditioned CG, rel_tol 1e-12,
identical stopping criterion ((Br,r) ≤ rel²·(Br0,r0) — linalg/solvers.cpp).
Driver source: the parity.cpp tool (kept outside the repo; see BASELINE.md
"CG iteration parity" for the regeneration recipe).

Our CG must reproduce MFEM's iteration counts EXACTLY — same operator, same
preconditioner, same criterion, f64 arithmetic.
"""

import pytest

from cardiac_ablation_ecm2_tpu.io.mesh_io import read_mfem_mesh
from cardiac_ablation_ecm2_tpu.models import poisson

DATA = "/root/reference/data"

# (mesh, order, uniform refinements) -> (ndof, MFEM CG iterations)
GOLDEN = {
    ("star.mesh", 1, 0): (31, 7),
    ("star.mesh", 2, 0): (101, 21),
    ("star.mesh", 3, 0): (211, 39),
    ("fichera.mesh", 2, 0): (117, 6),
    ("beam-hex.mesh", 2, 0): (153, 8),
    ("inline-quad.mesh", 2, 0): (81, 10),
    ("star.mesh", 2, 2): (1361, 97),
    ("fichera.mesh", 2, 2): (4401, 49),
    ("beam-hex.mesh", 2, 1): (825, 22),
}


@pytest.mark.parametrize("mf,order,refs", sorted(GOLDEN))
def test_cg_iteration_parity(mf, order, refs):
    ndof, iters = GOLDEN[(mf, order, refs)]
    m = read_mfem_mesh(f"{DATA}/{mf}")
    if refs:
        m = m.uniform_refinement(refs)
    res = poisson.solve(m, order=order, rel_tol=1e-12, max_iter=4000)
    assert res.fes.ndof == ndof
    assert res.converged
    assert res.iterations == iters, (res.iterations, iters)
