"""Coupled RF cardiac ablation: electrostatic Laplace → SAR Joule heating →
Pennes bioheat → Arrhenius lesion (BASELINE.json config 4 — the flagship app).

Reference analog: the coupled-physics architecture of
``miniapps/electromagnetics/joule.cpp`` (potential solve feeding a thermal
transient, joule_solver.hpp:107) specialized to cardiac RF ablation.

Pipeline per simulation:
  1. Solve ∇·(σ∇Φ)=0 once (σ constant in round 1; T-dependent σ re-solve is
     a flagged option re-running the potential solve every ``resolve_every``
     steps).
  2. Q_rf = σ|∇Φ|² enters the Pennes RHS.
  3. Implicit SDIRK stepping of T.
  4. Arrhenius damage integral Ω(t) = ∫ A·exp(−Eₐ/(R·T)) dt accumulated at
     quadrature points; lesion = {Ω ≥ 1} (63% cell death).

The per-step update (bioheat stage solves + damage accumulation) is one
jitted function; see ``step``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..fem.build import geom_factors_for
from ..fem.gridfunction import values_at_quad
from ..linalg import ode
from ..utils.config import real_t
from . import bioheat, rf_laplace

R_GAS = 8.314462618        # J/(mol K)


@dataclasses.dataclass(eq=False)
class AblationSim:
    """Coupled simulation state + jitted steppers."""

    mesh: object
    order: int = 2
    # RF
    sigma: float = 0.54                 # S/m
    voltage: float = 30.0               # V
    electrode_bdr: Sequence[int] = (1,)
    ground_bdr: Sequence[int] = (2,)
    # tissue thermal
    rho_c: float = 3.6e6                # J/(m³K)
    k_th: float = 0.54                  # W/(mK)
    w_cb: float = 20000.0               # perfusion ω_b c_b [W/(m³K)]
    T_a: float = 37.0
    q_met: float = 0.0
    body_bdr: Optional[Sequence[int]] = None   # fixed-T boundary
    # Arrhenius (cardiac tissue, Jacques-style parameters)
    arr_A: float = 7.39e39              # 1/s
    arr_Ea: float = 2.577e5             # J/mol
    solver: str = "sdirk33"
    rel_tol: float = 1e-10
    dtype: object = None
    #: (nx, ny, nz) to use the structured Cartesian fast path (large meshes)
    cartesian: object = None

    def __post_init__(self):
        fes = None
        if self.cartesian is not None:
            from ..fem.cartesian import CartesianFESpace

            fes = CartesianFESpace(self.mesh, self.order, tuple(self.cartesian))
        self.rf = rf_laplace.solve(
            self.mesh, self.order, self.sigma,
            self.electrode_bdr, self.ground_bdr, self.voltage,
            dtype=self.dtype, fes=fes,
        )
        self.fes = self.rf.fes
        self.op = bioheat.BioheatOperator(
            fes=self.fes, rho_c=self.rho_c, k=self.k_th, w_cb=self.w_cb,
            T_a=self.T_a, q_met=self.q_met, q_rf=self.rf.sar_q,
            ess_bdr=self.body_bdr, rel_tol=self.rel_tol, dtype=self.dtype,
        )
        self._solver = ode.select(self.solver)
        op, solver = self.op, self._solver
        A, Ea = self.arr_A, self.arr_Ea

        def _step(T, omega_q, t, dt):
            T2, t2 = solver.step(op, T, t, dt)
            # trapezoidal Arrhenius accumulation at quadrature points (T in °C)
            def rate(Tl):
                Tq = values_at_quad(self.fes, Tl, dtype=self.dtype)
                return A * jnp.exp(-Ea / (R_GAS * (Tq + 273.15)))

            omega_q = omega_q + 0.5 * dt * (rate(T) + rate(T2))
            return T2, omega_q, t2

        self.step = jax.jit(_step)

    def initial_state(self):
        dt_ = real_t(self.dtype)
        T = jnp.full(self.fes.ndof, self.T_a, dtype=dt_)
        gf = geom_factors_for(self.fes, dtype=self.dtype)
        omega_q = jnp.zeros_like(gf.det)
        return T, omega_q

    def run(self, t_final: float, dt: float, T=None, omega_q=None, t0=0.0):
        """Advance to t_final; returns (T, omega_q, t)."""
        if T is None:
            T, omega_q = self.initial_state()
        t = t0
        n = int(round((t_final - t0) / dt))
        for _ in range(n):
            T, omega_q, t = self.step(T, omega_q, t, dt)
        return T, omega_q, t

    def lesion_volume(self, omega_q) -> float:
        """Volume where Ω ≥ 1 (63% protein denaturation)."""
        gf = geom_factors_for(self.fes, dtype=self.dtype)
        return float(jnp.sum(gf.wdet * (omega_q >= 1.0)))
