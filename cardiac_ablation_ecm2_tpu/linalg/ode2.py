"""Second-order ODE integrators: d²u/dt² = f(t, u, du/dt).

Reference analog: ``SecondOrderTimeDependentOperator`` (``linalg/operator.hpp:777``)
and the Newmark / Generalized-α / central-difference family in
``linalg/ode2.cpp`` — the ex23 (wave equation) and ex10 (hyperelastic
dynamics) drivers.

Operator protocol:
* ``mult(t, u, v) -> a``  (explicit acceleration)
* ``implicit_solve(c0, c1, t, u, v) -> a`` solving
  ``a = f(t, u + c0·a, v + c1·a)`` — the analog of
  ``SecondOrderTimeDependentOperator::ImplicitSolve(fac0, fac1, x, dxdt, k)``.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class NewmarkSolver:
    """Newmark-β (default: average acceleration, unconditionally stable,
    2nd order; β=0 γ=1/2 gives explicit central difference)."""

    beta: float = 0.25
    gamma: float = 0.5

    def step(self, f, u, v, t, dt):
        b, g = self.beta, self.gamma
        if b == 0.0:
            a = f.mult(t, u, v)
            u1 = u + dt * v + 0.5 * dt * dt * a
            a1 = f.mult(t + dt, u1, v)        # predictor for velocity update
            v1 = v + dt * ((1 - g) * a + g * a1)
            return u1, v1, t + dt
        up = u + dt * v + (0.5 - b) * dt * dt * f.mult(t, u, v)
        vp = v + (1 - g) * dt * f.mult(t, u, v)
        a1 = f.implicit_solve(b * dt * dt, g * dt, t + dt, up, vp)
        u1 = up + b * dt * dt * a1
        v1 = vp + g * dt * a1
        return u1, v1, t + dt


def select2(name: str):
    """Registry for 2nd-order solvers (SecondOrderODESolver::Select analog).

    Newmark with (β=1/4, γ=1/2) = average acceleration (A-stable, 2nd order);
    (β=0, γ=1/2) = explicit central difference.  HHT/generalized-α variants
    are tracked for a later round."""
    if name in ("newmark", "average_acceleration"):
        return NewmarkSolver()
    if name == "central_difference":
        return NewmarkSolver(beta=0.0, gamma=0.5)
    if name == "linear_acceleration":
        return NewmarkSolver(beta=1.0 / 6.0, gamma=0.5)
    raise ValueError(name)
