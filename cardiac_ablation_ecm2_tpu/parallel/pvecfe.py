"""Sharded H(curl)/H(div) solves — the ex3p/ex4p capability slice.

Reference analog: ``examples/ex3p.cpp`` / ``ex4p.cpp``: ParMesh +
ND/RT ``ParFiniteElementSpace`` + parallel PA apply + PCG (SURVEY.md §2.5).
TPU-native: the *canonical* dof numbering makes vector spaces shard exactly
like H1 — canonical dof values are orientation-independent, so the halo
exchange is the same symmetric partial-sum ppermute schedule; per-element
orientation (±1 signs or true DofTransformations) is applied inside the
device-local gather/scatter, never across devices.  One ``shard_map``
region holds the whole CG solve with psum inner products.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

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

from ..linalg.solvers import cg
from ..ops.mixed_vecfe import _kind
from ..ops.vecfe import build_nd_operator, build_rt_operator, \
    vecfe_linear_form
from ..utils.config import real_t
from . import ops as pops
from .pfespace import build, gather_global, scatter_global
from .poisson import _stack_local_ess


class _Shim:
    """Duck-typed FESpace view of a vector space for ``pfespace.build``
    (canonical gather_map + mesh are all it needs)."""

    def __init__(self, space):
        self.mesh = space.mesh
        self.gather_map = np.asarray(space.gather_map)
        self.ndof_scalar = space.ndof
        self.order = 1                       # geometry nodes


@dataclasses.dataclass(eq=False)
class ParVecFE:
    pf: object
    dmesh: DeviceMesh
    solve_fn: Callable

    def solve(self):
        x_loc, iters, final = self.solve_fn()
        u = gather_global(self.pf, np.asarray(x_loc))
        return u[: self.pf.ndof_global], int(iters), float(final)


def setup(
    space,
    mass_coeff: Optional[float] = 1.0,
    curlcurl_coeff: Optional[float] = None,
    divdiv_coeff: Optional[float] = None,
    rhs_fn: Callable = None,
    ess_bdr: Optional[Sequence[int]] = None,
    ndev: Optional[int] = None,
    nq1d: int = 3,
    rel_tol: float = 1e-10,
    max_iter: int = 3000,
    dtype=None,
    devices=None,
) -> ParVecFE:
    """Sharded α(u,v)+β(curl u,curl v) (ND) or α(u,v)+β(div u,div v) (RT)
    solve with (f, v) RHS and homogeneous essential trace BCs."""
    rt = real_t(dtype)
    if devices is None:
        devices = jax.devices()
    if ndev is None:
        ndev = len(devices)

    if _kind(space) == "nd":
        op = build_nd_operator(space, mass_coeff=mass_coeff,
                               curlcurl_coeff=curlcurl_coeff, nq1d=nq1d,
                               dtype=dtype)
    else:
        op = build_rt_operator(space, mass_coeff=mass_coeff,
                               divdiv_coeff=divdiv_coeff, nq1d=nq1d,
                               dtype=dtype)

    pf = build(_Shim(space), ndev)
    dmesh = DeviceMesh(np.array(devices[:ndev]), (pops.AXIS,))

    # per-device stacked tables (padded elements weighted to zero)
    ew = pf.elem_weight                                   # (ndev, ne_loc)
    qds = [jnp.asarray(np.asarray(qd)[pf.elems]
                       * ew[:, :, None], rt) for _, qd, _ in op.terms]
    Bqs = [jnp.asarray(np.asarray(Bq)[pf.elems], rt) for _, _, Bq in
           op.terms]

    # orientation: stacked signs, or stacked DofTransformation codes
    simplex = op.tf is not None
    if simplex:
        dummy = jnp.zeros((ndev, pf.ne_loc, 1), jnp.int32)
        ec = (jnp.asarray(space.edge_code[pf.elems]) if space.nE
              else dummy)
        fc = (jnp.asarray(space.face_code[pf.elems])
              if (space.dim == 3 and space.nF) else dummy)
        eTi, fTi = getattr(space, "_eTi", None), getattr(space, "_fTi",
                                                         None)
        nle, nE = space.nle, space.nE
        nlf, nF = space.nlf, space.nF
        nI = space.nI
    else:
        sgs = jnp.asarray(np.asarray(op.signs)[pf.elems], rt)

    # serial-assembled RHS + diagonal, replicated to device-local slabs
    if rhs_fn is not None:
        b_glob = np.asarray(vecfe_linear_form(op, rhs_fn))
    else:
        b_glob = np.ones(op.ndof)
    d_glob = np.asarray(op.diagonal())
    ess_global = (space.essential_dofs(ess_bdr)
                  if ess_bdr is not None else np.zeros(0, np.int32))
    ess_loc = _stack_local_ess(pf, ess_global)

    bs = jnp.asarray(scatter_global(pf, b_glob), rt)
    ds = jnp.asarray(scatter_global(pf, d_glob), rt)
    gth = jnp.asarray(pf.gather)
    perm = jnp.asarray(pf.scat_perm)
    seg = jnp.asarray(pf.scat_seg)
    send = jnp.asarray(pf.send_idx)
    dw = jnp.asarray(pf.dof_weight, rt)
    essl = jnp.asarray(ess_loc)
    nloc = pf.nloc
    perms = pf.perms

    def _tf(e, codes_e, codes_f):
        """Per-device canonical → reference coefficients (transform)."""
        out, ofs = [], 0
        n = e.shape[0]
        if nE:
            blk = e[:, : nle * nE].reshape(n, nle, nE)
            T = eTi[codes_e]
            out.append(jnp.einsum("nekl,nel->nek", T, blk).reshape(n, -1))
            ofs += nle * nE
        if nF and space.dim == 3:
            blk = e[:, ofs: ofs + nlf * nF].reshape(n, nlf, nF)
            T = fTi[codes_f]
            out.append(jnp.einsum("nekl,nel->nek", T, blk).reshape(n, -1))
            ofs += nlf * nF
        if nI:
            out.append(e[:, ofs:])
        return jnp.concatenate(out, axis=1)

    def _tft(y, codes_e, codes_f):
        out, ofs = [], 0
        n = y.shape[0]
        if nE:
            blk = y[:, : nle * nE].reshape(n, nle, nE)
            T = eTi[codes_e]
            out.append(jnp.einsum("nelk,nel->nek", T, blk).reshape(n, -1))
            ofs += nle * nE
        if nF and space.dim == 3:
            blk = y[:, ofs: ofs + nlf * nF].reshape(n, nlf, nF)
            T = fTi[codes_f]
            out.append(jnp.einsum("nelk,nel->nek", T, blk).reshape(n, -1))
            ofs += nlf * nF
        if nI:
            out.append(y[:, ofs:])
        return jnp.concatenate(out, axis=1)

    nterm = len(op.terms)
    spec = P(pops.AXIS)
    n_in = 7 + 2 * nterm + (2 if simplex else 1)   # == len(args) below

    @partial(shard_map, mesh=dmesh, in_specs=(spec,) * n_in,
             out_specs=(spec, P(), P()), check_vma=False)
    def _solve(b, dg0, g, pm, sg, sd, w_dof, *rest):
        b, dg0, g, pm, sg = b[0], dg0[0], g[0], pm[0], sg[0]
        sd, w_dof = sd[0], w_dof[0]
        rest = [r[0] for r in rest]
        qd_l = rest[:nterm]
        Bq_l = rest[nterm: 2 * nterm]
        if simplex:
            ce = rest[2 * nterm]
            cf = rest[2 * nterm + 1]

            def pre(e):
                return _tf(e, ce, cf)

            def post(y):
                return _tft(y, ce, cf)
        else:
            sg_l = rest[2 * nterm]

            def pre(e):
                return e * sg_l

            post = pre
        ess = essl[lax.axis_index(pops.AXIS)]
        emask = jnp.ones(nloc + 1, rt).at[ess].set(0.0)

        def A(v):
            z = v * emask
            e = pre(z[g])
            y = jnp.zeros(e.shape, e.dtype)
            for qd, Bq in zip(qd_l, Bq_l):
                q = jnp.einsum("eqnc,en->eqc", Bq, e)
                y = y + jnp.einsum("eqnc,eqc->en", Bq,
                                   qd[..., None] * q)
            y = pops.local_scatter(post(y), pm, sg, nloc)
            y = pops.halo_sum(y, sd, perms, nloc)
            return y * emask + (v - z)

        b = pops.zero_at(b * emask, ess)
        dg = dg0 * emask + (1.0 - emask)
        dg = dg.at[nloc].set(1.0)
        dg = jnp.where(dg == 0.0, 1.0, dg)
        pdot = pops.make_pdot(w_dof)
        x, info = cg(A, b, M=lambda r: r / dg, rel_tol=rel_tol,
                     max_iter=max_iter, dot=pdot)
        return x[None], info.iterations, info.final_norm

    args = [bs, ds, gth, perm, seg, send, dw] + qds + Bqs
    if simplex:
        args += [ec, fc]
    else:
        args.append(sgs)

    def run():
        return jax.jit(_solve)(*args)

    return ParVecFE(pf=pf, dmesh=dmesh, solve_fn=run)
