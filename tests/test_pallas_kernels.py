"""Pallas fused diffusion apply vs the reference einsum path.

Runs the same kernel that executes on TPU, in interpret mode on CPU
(jax.experimental.pallas interpret=True) — validates the full 7-stage
contraction chain (grad passes → packed-D → transpose passes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.fem.build import basis_for, geom_factors_for
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
from cardiac_ablation_ecm2_tpu.ops import diffusion as dmod
from cardiac_ablation_ecm2_tpu.ops.pallas_kernels import diffusion_apply_pallas


@pytest.mark.parametrize("order", [1, 2, 3])
def test_pallas_diffusion_matches_einsum(order):
    mesh = make_cartesian_3d(4, 4, 4)
    fes = FESpace(mesh, order)
    db = basis_for(fes)
    gf = geom_factors_for(fes)
    qd = dmod.setup_packed(gf, 1.3)
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.random((mesh.ne, fes.nd_elem)).astype(np.float32))
    y_ref = np.asarray(dmod.apply(db, qd, e))
    y_pl = np.asarray(diffusion_apply_pallas(db, qd, e, block=16,
                                             interpret=True))
    scale = np.abs(y_ref).max()
    assert np.abs(y_ref - y_pl).max() < 1e-5 * scale


def test_pallas_diffusion_variable_coeff():
    mesh = make_cartesian_3d(4, 4, 4)
    fes = FESpace(mesh, 2)
    db = basis_for(fes)
    gf = geom_factors_for(fes)
    qd = dmod.setup_packed(gf, lambda x: 1.0 + x[..., 0] * x[..., 1])
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.random((mesh.ne, fes.nd_elem)).astype(np.float32))
    y_ref = np.asarray(dmod.apply(db, qd, e))
    y_pl = np.asarray(diffusion_apply_pallas(db, qd, e, block=32,
                                             interpret=True))
    scale = np.abs(y_ref).max()
    assert np.abs(y_ref - y_pl).max() < 1e-5 * scale
