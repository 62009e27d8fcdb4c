"""Sharded bioheat stepping vs serial BioheatOperator (the config-5 path)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.fem import FESpace
from cardiac_ablation_ecm2_tpu.linalg import ode
from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
from cardiac_ablation_ecm2_tpu.models import bioheat as ser_bio
from cardiac_ablation_ecm2_tpu.parallel import bioheat as par_bio
from cardiac_ablation_ecm2_tpu.parallel.pfespace import scatter_global


@pytest.mark.parametrize("ndev", [4, 8])
def test_parallel_bioheat_matches_serial(ndev):
    L = 0.02
    mesh = make_cartesian_3d(3, 3, 3, L, L, L)
    fes = FESpace(mesh, 2)

    def src(x):
        return 5e5 * jnp.exp(
            -((x[..., 0] - L / 2) ** 2 + (x[..., 1] - L / 2) ** 2
              + (x[..., 2] - L / 2) ** 2) / (L / 4) ** 2
        )

    def src_np(x):
        x = np.asarray(x)
        return 5e5 * np.exp(
            -((x[..., 0] - L / 2) ** 2 + (x[..., 1] - L / 2) ** 2
              + (x[..., 2] - L / 2) ** 2) / (L / 4) ** 2
        )

    kw = dict(rho_c=3.6e6, k=0.54, w_cb=2e4, T_a=37.0)
    op = ser_bio.BioheatOperator(
        fes=fes, q_met=src_np, ess_bdr=[1, 2, 3, 4, 5, 6], rel_tol=1e-12, **kw
    )
    step_ser = ser_bio.make_stepper(op, ode.select("sdirk33"))

    sim = par_bio.setup(
        mesh, order=2, ndev=ndev, q_src=src, ess_bdr=[1, 2, 3, 4, 5, 6],
        solver="sdirk33", rel_tol=1e-12, **kw,
    )

    T_ser = jnp.full(fes.ndof, 37.0)
    T_loc = sim.T0
    t = 0.0
    for _ in range(3):
        T_ser, _ = step_ser(T_ser, t, 1.0)
        T_loc, _ = sim.step(T_loc, t, 1.0)
        t += 1.0

    u_par = sim.gather(T_loc)
    err = np.abs(u_par - np.asarray(T_ser)).max()
    assert err < 1e-8, err
    assert float(np.max(u_par)) > 37.05   # the source actually heats


@pytest.mark.parametrize("ndev", [2, 4])
def test_cartesian_parallel_matches_serial(ndev):
    """Structured slab-partitioned bioheat == serial operator to 1e-8."""
    from cardiac_ablation_ecm2_tpu.parallel import cartesian_bioheat as cb
    from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d

    L = 0.04
    nx, ny, nz = 3, 3, 4
    mesh = make_cartesian_3d(nx, ny, nz, L, L, L)
    fes = FESpace(mesh, 2)

    def src(x):
        r2 = sum((x[..., i] - L / 2) ** 2 for i in range(3))
        return 1e6 * jnp.exp(-r2 / (L / 8) ** 2)

    def src_np(x):
        x = np.asarray(x)
        r2 = sum((x[..., i] - L / 2) ** 2 for i in range(3))
        return 1e6 * np.exp(-r2 / (L / 8) ** 2)

    kw = dict(rho_c=3.6e6, k=0.54, w_cb=2e4, T_a=37.0)
    op = ser_bio.BioheatOperator(
        fes=fes, q_met=src_np, ess_bdr=[1, 2, 3, 4, 5, 6], rel_tol=1e-12, **kw
    )
    step_ser = ser_bio.make_stepper(op, ode.select("sdirk33"))

    sim = cb.setup(nx, ny, nz, order=2, ndev=ndev, lengths=(L, L, L),
                   q_src=src, rel_tol=1e-12, **kw)

    T_ser = jnp.full(fes.ndof, 37.0)
    T_loc = sim.T0
    t = 0.0
    for _ in range(3):
        T_ser, _ = step_ser(T_ser, t, 1.0)
        T_loc, _ = sim.step(T_loc, t, 1.0)
        t += 1.0

    u_par = sim.gather(T_loc)   # lex lattice ordering
    # compare via coordinates (serial FESpace ordering differs)
    from cardiac_ablation_ecm2_tpu.fem.cartesian import CartesianFESpace

    cfes = CartesianFESpace(mesh, 2, (nx, ny, nz), (L, L, L))
    order_c = np.lexsort(np.round(cfes.dof_coords.T, 9))
    order_g = np.lexsort(np.round(fes.dof_coords.T, 9))
    err = np.abs(u_par[order_c] - np.asarray(T_ser)[order_g]).max()
    assert err < 1e-8, err
    assert u_par.max() > 37.05


def test_parallel_bioheat_cardiac_tet_matches_serial():
    """Config-5 workload shape: the sharded step on a REAL unstructured
    cardiac tet mesh (Delaunay + electrode notch) matches serial to 1e-8."""
    from cardiac_ablation_ecm2_tpu.mesh.cardiac import make_cardiac_tet_mesh

    L = 0.04
    mesh = make_cardiac_tet_mesh(8, lengths=(L, L, L / 2),
                                 electrode_radius=0.004)
    fes = FESpace(mesh, 2)

    ctr = (L / 2, L / 2, L / 4)

    def src(x):
        r2 = sum((x[..., i] - ctr[i]) ** 2 for i in range(3))
        return 2e7 * jnp.exp(-r2 / (2 * 0.003 ** 2))

    def src_np(x):
        x = np.asarray(x)
        r2 = sum((x[..., i] - ctr[i]) ** 2 for i in range(3))
        return 2e7 * np.exp(-r2 / (2 * 0.003 ** 2))

    kw = dict(rho_c=3.6e6, k=0.54, w_cb=2e4, T_a=37.0)
    op = ser_bio.BioheatOperator(
        fes=fes, q_met=src_np, ess_bdr=[1, 2, 3, 4, 5, 6], rel_tol=1e-12,
        **kw)
    step_ser = ser_bio.make_stepper(op, ode.select("sdirk33"))

    sim = par_bio.setup(
        mesh, order=2, ndev=8, q_src=src, ess_bdr=[1, 2, 3, 4, 5, 6],
        solver="sdirk33", rel_tol=1e-12, **kw)

    T_ser = jnp.full(fes.ndof, 37.0)
    T_loc = sim.T0
    t = 0.0
    for _ in range(2):
        T_ser, _ = step_ser(T_ser, t, 0.25)
        T_loc, _ = sim.step(T_loc, t, 0.25)
        t += 0.25
    u_par = sim.gather(T_loc)
    err = np.abs(u_par - np.asarray(T_ser)).max()
    assert err < 1e-8, err
    assert float(np.max(u_par)) > 37.5
