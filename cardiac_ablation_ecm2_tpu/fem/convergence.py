"""Convergence-rate bookkeeping.

Reference analog: ``ConvergenceStudy`` (``fem/convergence.hpp``, impl
``fem/convergence.cpp``) — collects per-level errors and dof counts across
a refinement study and reports the observed rates
``rate_k = log(e_{k-1}/e_k) / log(h_{k-1}/h_k)``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional

import numpy as np


@dataclasses.dataclass
class ConvergenceStudy:
    """Accumulate (ndof, h, error) levels; compute observed rates.

    ``h`` defaults to ``ndof**(-1/dim)`` when not given — the same uniform
    scaling the reference uses for its dof-based rates."""

    dim: int = 2
    _nd: List[int] = dataclasses.field(default_factory=list)
    _h: List[float] = dataclasses.field(default_factory=list)
    _err: List[float] = dataclasses.field(default_factory=list)

    def add_level(self, error: float, ndof: int,
                  h: Optional[float] = None) -> None:
        self._nd.append(int(ndof))
        self._h.append(float(h) if h is not None
                       else float(ndof) ** (-1.0 / self.dim))
        self._err.append(float(error))

    @property
    def nlevels(self) -> int:
        return len(self._err)

    def errors(self) -> np.ndarray:
        return np.asarray(self._err)

    def rates(self) -> np.ndarray:
        """Per-refinement observed rates (length nlevels−1)."""
        e, h = np.asarray(self._err), np.asarray(self._h)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(e[:-1] / e[1:]) / np.log(h[:-1] / h[1:])

    def rate(self) -> float:
        """Last observed rate (the reference prints exactly this)."""
        r = self.rates()
        return float(r[-1]) if len(r) else math.nan

    def print(self, stream=None, label: str = "error") -> None:
        import sys

        out = stream or sys.stdout
        rs = self.rates()
        print(f"{'dofs':>10} {'h':>12} {label:>14} {'rate':>7}", file=out)
        for k in range(self.nlevels):
            r = f"{rs[k - 1]:7.3f}" if k else "      -"
            print(f"{self._nd[k]:>10} {self._h[k]:>12.4e} "
                  f"{self._err[k]:>14.6e} {r}", file=out)


def study(solve: Callable, levels, dim: int = 2) -> ConvergenceStudy:
    """Run ``solve(level) -> (error, ndof)`` over ``levels`` and collect."""
    cs = ConvergenceStudy(dim=dim)
    for lv in levels:
        err, nd = solve(lv)
        cs.add_level(err, nd)
    return cs
