"""Sharded bioheat on structured Cartesian meshes — the production
realization of BASELINE config 5 (1M-hex mesh over a chip mesh).

Domain decomposition = contiguous z-slabs of the dof lattice (one device per
slab).  Each device's restriction is the gather-free structured one
(fem/cartesian.py); the halo is a single shared dof *plane* per z-neighbor,
exchanged with one ``lax.ppermute`` each way per operator apply — the
minimal-communication realization of GroupCommunicator for a structured
partition.  The full SDIRK timestep (stage PCG solves with psum dots) is one
jitted shard_map region.
"""

from __future__ import annotations

import dataclasses
from functools import partial as fpartial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..fem.basis import make_dof_to_quad
from ..fem.cartesian import StructuredRestriction
from ..fem.fespace import element_node_coords
from ..fem.geom_factors import compute_geometric_factors
from ..fem.geometry import Geometry
from ..fem.quadinterp import device_basis, eval_values_t
from ..linalg import ode
from ..linalg.solvers import cg
from ..mesh.mesh import make_cartesian_3d
from ..ops import diffusion as dmod
from ..ops import mass as mmod
from ..utils.config import index_t, real_t

AXIS = "d"


@dataclasses.dataclass(eq=False)
class ParCartesianBioheat:
    ndev: int
    n: tuple                      # global (nx, ny, nz)
    order: int
    nloc_shape: tuple             # (Nz_loc, Ny, Nx) local dof lattice
    step: Callable                # (T_loc, t, dt) -> (T_loc, t)
    T0: jnp.ndarray               # (ndev, Nl+1)

    def gather(self, T_loc) -> np.ndarray:
        """Stacked local → global lattice vector (z slowest)."""
        T_loc = np.asarray(T_loc)[:, :-1]
        Nzl, Ny, Nx = self.nloc_shape
        out = []
        for d in range(self.ndev):
            sl = T_loc[d].reshape(Nzl, Ny, Nx)
            out.append(sl if d == self.ndev - 1 else sl[:-1])
        return np.concatenate(out, axis=0).reshape(-1)


def setup(
    nx: int, ny: int, nz: int,
    order: int = 2,
    ndev: Optional[int] = None,
    lengths=(0.04, 0.04, 0.04),
    rho_c: float = 3.6e6, k: float = 0.54, w_cb: float = 2e4,
    T_a: float = 37.0,
    q_src: Optional[Callable] = None,
    ess_all_boundary: bool = True,
    solver: str = "sdirk33",
    rel_tol: float = 1e-5,
    max_iter: int = 300,
    dtype=None,
    devices=None,
) -> ParCartesianBioheat:
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)
    assert nz % ndev == 0, "nz must be divisible by the device count"
    nzl = nz // ndev
    p = order
    rt = real_t(dtype)
    dmesh = DeviceMesh(np.array(devices[:ndev]), (AXIS,))
    tab = ode.select(solver).tableau

    # local slab structured restriction (identical on every device)
    R = StructuredRestriction((nx, ny, nzl), p, (p * nx + 1) * (p * ny + 1) * (p * nzl + 1))
    Nx, Ny, Nzl = p * nx + 1, p * ny + 1, p * nzl + 1
    Nl = Nx * Ny * Nzl
    d2q = make_dof_to_quad(Geometry.CUBE, p, p + 2)
    db = device_basis(d2q, dtype)

    # per-device element slab node coordinates (host-stacked)
    Lx, Ly, Lz = lengths
    full = make_cartesian_3d(nx, ny, nz, Lx, Ly, Lz)
    Xe = element_node_coords(full, p)                 # (ne, ndg, 3)
    ne_loc = nx * ny * nzl
    Xs = jnp.asarray(
        Xe.reshape(ndev, ne_loc, *Xe.shape[1:]), rt
    )

    # essential dofs per device (all 6 outer faces)
    ess_rows = []
    for d in range(ndev):
        m = np.zeros((Nzl, Ny, Nx), dtype=bool)
        if ess_all_boundary:
            m[:, 0, :] = True; m[:, -1, :] = True
            m[:, :, 0] = True; m[:, :, -1] = True
            if d == 0:
                m[0] = True
            if d == ndev - 1:
                m[-1] = True
        ess_rows.append(np.nonzero(m.reshape(-1))[0])
    m_ess = max((len(r) for r in ess_rows), default=1) or 1
    ess_tab = np.full((ndev, m_ess), Nl, dtype=np.int64)   # pad → trash slot
    for d, r in enumerate(ess_rows):
        ess_tab[d, : len(r)] = r
    ess_tab = jnp.asarray(ess_tab, index_t())

    # dot-product weights: interior shared planes count half on each side
    wrows = []
    for d in range(ndev):
        w = np.ones((Nzl, Ny, Nx))
        if d > 0:
            w[0] *= 0.5
        if d < ndev - 1:
            w[-1] *= 0.5
        wrows.append(np.concatenate([w.reshape(-1), [0.0]]))
    w_dof = jnp.asarray(np.stack(wrows), rt)

    perm_up = tuple((d, d + 1) for d in range(ndev - 1))
    perm_dn = tuple((d + 1, d) for d in range(ndev - 1))
    plane = Ny * Nx

    def halo(y):
        """Add z-neighbor partial sums on the shared planes."""
        y3 = y.reshape(Nzl, plane)
        top, bot = y3[-1], y3[0]
        from_below = lax.ppermute(top, AXIS, perm_up)   # below's top → my bot
        from_above = lax.ppermute(bot, AXIS, perm_dn)   # above's bot → my top
        y3 = y3.at[0].add(from_below).at[-1].add(from_above)
        return y3.reshape(-1)

    spec = P(AXIS)

    @fpartial(shard_map, mesh=dmesh, in_specs=(spec,),
              out_specs=(spec,) * 5, check_vma=False)
    def _setup(X):
        X = X[0]
        gf = compute_geometric_factors(X, d2q, dtype)
        qm = mmod.setup(gf) * rho_c
        qw = mmod.setup(gf) * w_cb
        qk = dmod.setup_packed(gf, k)
        q = qw * T_a
        if q_src is not None:
            q = q + gf.wdet * q_src(gf.x).astype(rt)
        b = halo(R.mult_transpose(eval_values_t(db, q)))
        dM = halo(R.mult_transpose(mmod.diagonal(db, qm)))
        dA = halo(R.mult_transpose(
            dmod.diagonal(db, qk) + mmod.diagonal(db, qw)))
        return qm[None], qw[None], qk[None], b[None], jnp.stack([dM, dA])[None]

    qm, qw, qk, b_c, diags = jax.jit(_setup)(Xs)

    @fpartial(
        shard_map, mesh=dmesh,
        in_specs=(spec,) * 6 + (P(), P()),
        out_specs=(spec, P()),
        check_vma=False,
    )
    def step_fn(T, qm_, qw_, qk_, bc_, dgs_, t, dt):
        T, qm, qw, qk, bc, dgs = T[0], qm_[0], qw_[0], qk_[0], bc_[0], dgs_[0]
        ess = ess_tab[lax.axis_index(AXIS)]
        wd = w_dof[lax.axis_index(AXIS)]
        dM, dA = dgs[0], dgs[1]

        def pdot(a, b):
            x = a * wd * b
            if jax.config.jax_enable_x64 and x.dtype != jnp.float64:
                x = x.astype(jnp.float64)
            return lax.psum(jnp.sum(x), AXIS).astype(a.dtype)

        def zero_ess(v):
            return v.at[ess].set(0.0)

        def pad(v):
            return jnp.concatenate([v, jnp.zeros(1, v.dtype)])

        def Aop(v):
            u = v[:Nl]
            e = R.mult(u)
            y = mmod.apply(db, qw, e) + dmod.apply(db, qk, e)
            return pad(halo(R.mult_transpose(y)))

        def Mrc(v):
            u = v[:Nl]
            e = R.mult(u)
            return pad(halo(R.mult_transpose(mmod.apply(db, qm, e))))

        bcp = pad(bc)

        def implicit_solve(gamma, Tv):
            rhs = zero_ess(bcp - Aop(Tv))

            def lhs(v):
                z = zero_ess(v)
                return zero_ess(Mrc(z) + gamma * Aop(z)) + (v - z)

            dg = pad(dM + gamma * dA)
            dg = dg.at[ess].set(1.0).at[Nl].set(1.0)
            dg = jnp.where(dg == 0.0, 1.0, dg)
            x, _ = cg(lhs, rhs, M=lambda r: r / dg, rel_tol=rel_tol,
                      max_iter=max_iter, dot=pdot)
            return zero_ess(x)

        ks = []
        for i in range(tab.stages):
            y = T
            for j in range(i):
                if tab.a[i, j] != 0.0:
                    y = y + (dt * float(tab.a[i, j])) * ks[j]
            ks.append(implicit_solve(float(tab.a[i, i]) * dt, y))
        for i in range(tab.stages):
            if tab.b[i] != 0.0:
                T = T + (dt * float(tab.b[i])) * ks[i]
        return T[None], t + dt

    jit_step = jax.jit(step_fn)

    def step(T_loc, t, dt):
        return jit_step(T_loc, qm, qw, qk, b_c, diags,
                        jnp.asarray(t, rt), jnp.asarray(dt, rt))

    T0 = jnp.full((ndev, Nl + 1), T_a, dtype=rt)
    T0 = T0.at[:, Nl].set(0.0)
    return ParCartesianBioheat(
        ndev=ndev, n=(nx, ny, nz), order=order,
        nloc_shape=(Nzl, Ny, Nx), step=step, T0=T0,
    )
