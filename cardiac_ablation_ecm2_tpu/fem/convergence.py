"""Convergence-rate studies.

Reference analog: ``ConvergenceStudy`` (``fem/convergence.hpp``, impl
``fem/convergence.cpp``) — collects errors over a refinement sequence and
reports per-step and asymptotic observed rates
``rate_k = log(e_{k-1}/e_k) / log(h_{k-1}/h_k)``.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, List, Optional

import numpy as np


@dataclasses.dataclass
class ConvergenceStudy:
    """Accumulate (h, ndof, error) rows; report per-step and asymptotic
    rates.  ``h`` defaults to ``ndof**(-1/dim)`` in ``add_level`` — the
    same uniform scaling the reference uses for dof-based rates."""

    dim: int = 2
    errors: List[float] = dataclasses.field(default_factory=list)
    hs: List[float] = dataclasses.field(default_factory=list)
    ndofs: List[int] = dataclasses.field(default_factory=list)

    def add(self, h: float, ndof: int, error: float) -> None:
        self.hs.append(float(h))
        self.ndofs.append(int(ndof))
        self.errors.append(float(error))

    def add_level(self, error: float, ndof: int,
                  h: Optional[float] = None) -> None:
        self.add(float(ndof) ** (-1.0 / self.dim) if h is None else h,
                 ndof, error)

    @property
    def nlevels(self) -> int:
        return len(self.errors)

    def rates(self) -> np.ndarray:
        e, h = np.asarray(self.errors), np.asarray(self.hs)
        if len(e) < 2:
            return np.zeros(0)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(e[:-1] / e[1:]) / np.log(h[:-1] / h[1:])

    def asymptotic_rate(self) -> float:
        """Last observed rate (the reference prints exactly this)."""
        r = self.rates()
        return float(r[-1]) if len(r) else float("nan")

    # short alias
    rate = asymptotic_rate

    def report(self) -> str:
        lines = ["    h        ndof       error       rate"]
        rates = [float("nan")] + list(self.rates())
        for h, n, e, r in zip(self.hs, self.ndofs, self.errors, rates):
            lines.append(f"{h:9.4g} {n:9d} {e:12.4e} {r:8.3f}")
        return "\n".join(lines)

    def print(self, stream=None) -> None:
        print(self.report(), file=stream or sys.stdout)


def study(solve: Callable, levels, dim: int = 2) -> ConvergenceStudy:
    """Run ``solve(level) -> (error, ndof)`` over ``levels`` and collect."""
    cs = ConvergenceStudy(dim=dim)
    for lv in levels:
        err, nd = solve(lv)
        cs.add_level(err, nd)
    return cs
