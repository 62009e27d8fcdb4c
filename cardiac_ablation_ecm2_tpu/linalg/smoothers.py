"""Operator smoothers / simple preconditioners.

Reference analog: ``OperatorJacobiSmoother`` (``linalg/solvers.hpp:421``) and
``OperatorChebyshevSmoother`` (``solvers.hpp:502``).  Both act on the assembled
PA diagonal (AssembleDiagonalPA path, fem/bilinearform_ext.cpp:370).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .solvers import default_dot, power_method


def jacobi(diag: jnp.ndarray, damping: float = 1.0) -> Callable:
    """M(r) = damping · r / diag  (OperatorJacobiSmoother)."""
    inv = damping / diag

    def prec(r):
        return inv * r

    return prec


def chebyshev(
    A: Callable,
    diag: jnp.ndarray,
    order: int = 4,
    eig_max: Optional[float] = None,
    eig_ratio: float = 30.0,
    power_iters: int = 20,
    dot: Callable = default_dot,
    v0: Optional[jnp.ndarray] = None,
) -> Callable:
    """Chebyshev-accelerated Jacobi smoother of given polynomial order.

    Approximates A^{-1} on the eigenvalue interval
    [eig_max/eig_ratio, 1.1·eig_max] of D^{-1}A (hypre-style bounds; the
    reference uses the same PowerMethod estimate).  ``eig_max`` may be passed
    to avoid the setup-time power iteration (e.g. when dt-scaled operators
    reuse an estimate).  Under shard_map pass the sharded ``dot`` and a
    halo-consistent deterministic ``v0``.
    """
    dinv = 1.0 / diag

    def DinvA(v):
        return dinv * A(v)

    if eig_max is None:
        eig_max = power_method(DinvA, diag.shape[0], iters=power_iters,
                               dtype=diag.dtype, dot=dot, v0=v0)
    upper = 1.1 * eig_max
    lower = eig_max / eig_ratio
    theta = 0.5 * (upper + lower)
    delta = 0.5 * (upper - lower)

    sigma1 = theta / delta

    def prec(r):
        # preconditioned Chebyshev iteration for A x = r, x0 = 0 (Saad 12.1)
        x = jnp.zeros_like(r)
        d = (1.0 / theta) * (dinv * r)
        rho = 1.0 / sigma1
        for _ in range(order):
            x = x + d
            res = r - A(x)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * res)
            rho = rho_new
        return x

    return prec
