"""Convergence-rate studies.

Reference analog: ``ConvergenceStudy`` (``fem/convergence.cpp``) — collects
errors over a refinement sequence and reports rates.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class ConvergenceStudy:
    """Accumulate (h, ndof, error) rows; report per-step and asymptotic rates."""

    errors: List[float] = dataclasses.field(default_factory=list)
    hs: List[float] = dataclasses.field(default_factory=list)
    ndofs: List[int] = dataclasses.field(default_factory=list)

    def add(self, h: float, ndof: int, error: float) -> None:
        self.hs.append(float(h))
        self.ndofs.append(int(ndof))
        self.errors.append(float(error))

    def rates(self) -> np.ndarray:
        e, h = np.asarray(self.errors), np.asarray(self.hs)
        if len(e) < 2:
            return np.zeros(0)
        return np.log(e[:-1] / e[1:]) / np.log(h[:-1] / h[1:])

    def asymptotic_rate(self) -> float:
        r = self.rates()
        return float(r[-1]) if len(r) else float("nan")

    def report(self) -> str:
        lines = ["    h        ndof       error       rate"]
        rates = [float("nan")] + list(self.rates())
        for h, n, e, r in zip(self.hs, self.ndofs, self.errors, rates):
            lines.append(f"{h:9.4g} {n:9d} {e:12.4e} {r:8.2f}")
        return "\n".join(lines)
