"""Additional Krylov solvers: MINRES and BiCGStab.

Reference analog: ``MINRESSolver`` / ``BiCGSTABSolver``
(``linalg/solvers.hpp``, impl ``linalg/solvers.cpp``).  Same matrix-free
callable conventions as ``solvers.cg``; jit-safe ``lax.while_loop`` bodies.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from .solvers import SolveInfo, default_dot


def minres(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rel_tol: float = 1e-8,
    abs_tol: float = 0.0,
    max_iter: int = 500,
    dot: Callable = default_dot,
):
    """Preconditioned MINRES for symmetric (possibly indefinite) systems.

    (Reference: MINRESSolver::Mult; tests/unit analog test_cg_indefinite.)
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    prec = M if M is not None else (lambda v: v)

    r = b - A(x0)
    z = prec(r)
    beta0 = jnp.sqrt(dot(r, z))
    target = jnp.maximum(rel_tol * beta0, abs_tol)

    # Lanczos + Givens (Paige-Saunders)
    state0 = dict(
        x=x0,
        v_old=jnp.zeros_like(b), v=r / jnp.maximum(beta0, 1e-300),
        z=z / jnp.maximum(beta0, 1e-300),
        w=jnp.zeros_like(b), w_old=jnp.zeros_like(b),
        eta=beta0, s_old=jnp.zeros(()), s=jnp.zeros(()),
        c_old=jnp.ones(()), c=jnp.ones(()),
        beta=beta0, res=beta0, k=jnp.int32(0),
        done=beta0 <= target,
    )

    def cond(st):
        return jnp.logical_and(st["k"] < max_iter, jnp.logical_not(st["done"]))

    def body(st):
        v, z, beta = st["v"], st["z"], st["beta"]
        Az = A(z)
        alpha = dot(Az, z)
        r_new = Az - alpha * v - beta * st["v_old"]
        z_new = prec(r_new)
        beta_new = jnp.sqrt(jnp.abs(dot(r_new, z_new)))
        # rotations
        c, s, c_old, s_old = st["c"], st["s"], st["c_old"], st["s_old"]
        rho1 = c * alpha - c_old * s * beta
        rho2 = s * alpha + c_old * c * beta
        rho3 = s_old * beta
        delta = jnp.sqrt(rho1**2 + beta_new**2)
        c_new = rho1 / jnp.maximum(delta, 1e-300)
        s_new = beta_new / jnp.maximum(delta, 1e-300)
        w_new = (z - rho2 * st["w"] - rho3 * st["w_old"]) / jnp.maximum(
            delta, 1e-300
        )
        x = st["x"] + c_new * st["eta"] * w_new
        eta = -s_new * st["eta"]
        res = jnp.abs(eta)
        return dict(
            x=x,
            v_old=v, v=r_new / jnp.maximum(beta_new, 1e-300),
            z=z_new / jnp.maximum(beta_new, 1e-300),
            w=w_new, w_old=st["w"],
            eta=eta, s_old=s, s=s_new, c_old=c, c=c_new,
            beta=beta_new, res=res, k=st["k"] + 1,
            done=res <= target,
        )

    st = lax.while_loop(cond, body, state0)
    return st["x"], SolveInfo(
        iterations=st["k"], final_norm=st["res"], converged=st["done"]
    )


def bicgstab(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rel_tol: float = 1e-8,
    abs_tol: float = 0.0,
    max_iter: int = 500,
    dot: Callable = default_dot,
):
    """Preconditioned BiCGStab for general nonsymmetric systems
    (BiCGSTABSolver::Mult analog)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    prec = M if M is not None else (lambda v: v)

    r0 = b - A(x0)
    nrm0 = jnp.sqrt(dot(r0, r0))
    target = jnp.maximum(rel_tol * nrm0, abs_tol)

    state0 = (
        x0, r0, r0, jnp.ones(()), jnp.ones(()), jnp.ones(()),
        jnp.zeros_like(b), jnp.zeros_like(b), nrm0, jnp.int32(0),
        nrm0 <= target,
    )

    def cond(st):
        return jnp.logical_and(st[9] < max_iter, jnp.logical_not(st[10]))

    def body(st):
        x, r, rtilde, rho_old, alpha, omega, p, v, _res, k, _ = st
        rho = dot(rtilde, r)
        beta = (rho / jnp.where(rho_old == 0, 1e-300, rho_old)) * (
            alpha / jnp.where(omega == 0, 1e-300, omega)
        )
        p = r + beta * (p - omega * v)
        ph = prec(p)
        v = A(ph)
        alpha = rho / jnp.where(dot(rtilde, v) == 0, 1e-300, dot(rtilde, v))
        s = r - alpha * v
        sh = prec(s)
        t = A(sh)
        tt = dot(t, t)
        omega = dot(t, s) / jnp.where(tt == 0, 1e-300, tt)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        res = jnp.sqrt(dot(r, r))
        return (x, r, rtilde, rho, alpha, omega, p, v, res, k + 1,
                res <= target)

    st = lax.while_loop(cond, body, state0)
    return st[0], SolveInfo(iterations=st[9], final_norm=st[8], converged=st[10])


def fgmres(
    A: Callable,
    b: jnp.ndarray,
    x0=None,
    M: Callable = None,
    rel_tol: float = 1e-8,
    abs_tol: float = 0.0,
    max_iter: int = 200,
    restart: int = 50,
    dot: Callable = default_dot,
):
    """Flexible GMRES (FGMRESSolver, linalg/solvers.hpp) — right
    preconditioning with a preconditioner that may CHANGE between
    applications (e.g. an inner iterative solve), storing the
    preconditioned basis Z alongside the Krylov basis V."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    prec = M if M is not None else (lambda v: v)
    n = b.shape[0]
    m = restart
    dt = b.dtype

    r0 = b - A(x0)
    beta0 = jnp.sqrt(dot(r0, r0))
    target = jnp.maximum(rel_tol * beta0, abs_tol)

    def cycle(x):
        r = b - A(x)
        beta = jnp.sqrt(dot(r, r))
        V = jnp.zeros((m + 1, n), dt).at[0].set(r / jnp.maximum(beta, 1e-300))
        Z = jnp.zeros((m, n), dt)
        H = jnp.zeros((m + 1, m), dt)
        cs = jnp.zeros(m, dt)
        sn = jnp.zeros(m, dt)
        g = jnp.zeros(m + 1, dt).at[0].set(beta)

        def step(j, carry):
            V, Z, H, cs, sn, g, res, done = carry

            def do(carry):
                V, Z, H, cs, sn, g, res = carry
                z = prec(V[j])
                Z2 = Z.at[j].set(z)
                w = A(z)

                def mgs(i, wh):
                    w, H = wh
                    hij = jnp.where(i <= j, dot(w, V[i]), 0.0)
                    w = w - hij * V[i]
                    return (w, H.at[i, j].set(hij))

                w, H = lax.fori_loop(0, m + 1, mgs, (w, H))
                hj1 = jnp.sqrt(dot(w, w))
                H = H.at[j + 1, j].set(hj1)
                V2 = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))

                def giv(i, H):
                    t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                    H = H.at[i + 1, j].set(
                        -sn[i] * H[i, j] + cs[i] * H[i + 1, j])
                    return H.at[i, j].set(t)

                H = lax.fori_loop(0, j, giv, H)
                denom = jnp.sqrt(H[j, j] ** 2 + H[j + 1, j] ** 2)
                c = H[j, j] / jnp.maximum(denom, 1e-300)
                s = H[j + 1, j] / jnp.maximum(denom, 1e-300)
                H = H.at[j, j].set(denom).at[j + 1, j].set(0.0)
                g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
                return (V2, Z2, H, cs.at[j].set(c), sn.at[j].set(s), g,
                        jnp.abs(g[j + 1]))

            V, Z, H, cs, sn, g, res = lax.cond(
                done, lambda c: c, do, (V, Z, H, cs, sn, g, res)
            )
            return (V, Z, H, cs, sn, g, res, jnp.logical_or(done,
                                                            res <= target))

        V, Z, H, cs, sn, g, res, _ = lax.fori_loop(
            0, m, step, (V, Z, H, cs, sn, g, beta, beta <= target)
        )
        # back-substitution on the m×m triangular H (masked for safety)
        y = jnp.zeros(m, dt)

        def back(i_, y):
            i = m - 1 - i_
            num = g[i] - jnp.dot(H[i, :], y)
            return y.at[i].set(num / jnp.where(H[i, i] == 0, 1.0, H[i, i]))

        y = lax.fori_loop(0, m, back, y)
        return x + jnp.einsum("j,jn->n", y, Z), res

    def cond(st):
        x, res, it = st
        return jnp.logical_and(it < max_iter, res > target)

    def body(st):
        x, _res, it = st
        x, res = cycle(x)
        return (x, res, it + m)

    x, res, it = lax.while_loop(cond, body, (x0, beta0, jnp.int32(0)))
    return x, SolveInfo(iterations=it, final_norm=res,
                        converged=res <= target)


def ortho_wrap(op: Callable, dot: Callable = default_dot) -> Callable:
    """OrthoSolver analog (linalg/solvers.hpp:OrthoSolver): wrap an operator
    (or preconditioner) so inputs/outputs are projected orthogonal to
    constants — the right setting for pure-Neumann (singular) problems."""

    def proj(v):
        n = v.shape[0]
        return v - jnp.sum(v) / n

    def wrapped(v):
        return proj(op(proj(v)))

    return wrapped
