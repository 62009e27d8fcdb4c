"""Coupled RF ablation app (BASELINE configs 3-4): potential → SAR → bioheat →
Arrhenius lesion, with an analytic cross-check on the uniform-field case."""

import numpy as np
import pytest
import jax.numpy as jnp

from cardiac_ablation_ecm2_tpu.mesh import make_cartesian_3d
from cardiac_ablation_ecm2_tpu.models import ablation, rf_laplace


def test_rf_uniform_field():
    """Plate-electrode box: Φ is linear in z, SAR = σ(V/L)² exactly."""
    L, V, sigma = 0.02, 20.0, 0.5
    mesh = make_cartesian_3d(3, 3, 3, L, L, L)
    res = rf_laplace.solve(
        mesh, order=2, sigma=sigma, electrode_bdr=[6], ground_bdr=[1],
        voltage=V,
    )
    assert res.converged
    E = V / L
    sar_exact = sigma * E * E
    assert np.allclose(np.asarray(res.sar_q), sar_exact, rtol=1e-8)
    P = float(rf_laplace.total_power(res.fes, res.sar_q))
    assert np.isclose(P, sar_exact * L**3, rtol=1e-10)


def test_ablation_heating_and_lesion():
    """2cm tissue cube, plate electrodes: T rises, lesion volume is monotone
    and bounded by the domain."""
    L = 0.02
    mesh = make_cartesian_3d(4, 4, 4, L, L, L)
    sim = ablation.AblationSim(
        mesh=mesh, order=2, sigma=0.5, voltage=50.0,
        electrode_bdr=[6], ground_bdr=[1],
        w_cb=20000.0, body_bdr=None, solver="sdirk33", rel_tol=1e-11,
    )
    T, om = sim.initial_state()
    t = 0.0
    assert float(jnp.max(om)) == 0.0
    vols = []
    for _ in range(8):
        T, om, t = sim.step(T, om, t, 0.5)
        vols.append(sim.lesion_volume(om))
    Tmax = float(jnp.max(T))
    assert Tmax > 37.5, Tmax            # heating happened
    assert Tmax < 150.0, Tmax           # physically plausible
    assert all(b >= a for a, b in zip(vols, vols[1:]))   # lesion monotone
    assert vols[-1] <= L**3 + 1e-12
    # energy balance sanity: with uniform SAR, mean temperature rise over the
    # first step ≈ Q dt/ρc (before conduction/perfusion losses dominate)
    E = 50.0 / L
    q = 0.5 * E * E
    rise_ub = q * 4.0 / 3.6e6          # upper bound on mean rise after 4 s
    mean_rise = float(jnp.mean(T)) - 37.0
    assert 0 < mean_rise <= rise_ub * 1.05, (mean_rise, rise_ub)
