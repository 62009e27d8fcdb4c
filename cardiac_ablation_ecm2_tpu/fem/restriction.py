"""Element restriction: L-vector ↔ E-vector gather/scatter.

Reference analog: ``ElementRestriction`` (``fem/restriction.hpp:40``) with its
precomputed ``offsets/indices/gather_map`` arrays (``restriction.hpp:50-52``)
and atomic-free transpose.

TPU-native design:
* L→E is a plain JAX gather ``u[gather_map]`` — XLA lowers this to an
  efficient dynamic-gather; a Pallas double-buffered variant exists in
  ``ops/pallas_kernels.py`` for the HBM-bound large-mesh regime.
* E→L (transpose, scatter-add) uses a **sorted segment-sum**: a host-side
  precomputed permutation sorts E-slots by destination L-dof, and
  ``jax.ops.segment_sum(..., indices_are_sorted=True)`` accumulates.  This is
  deterministic by construction — the analog of the reference's atomic-free
  offset-based transpose (``fem/restriction.cpp``) and the determinism test
  ``tests/unit/fem/test_fa_determinism.cpp``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import index_t


@dataclasses.dataclass(frozen=True)
class ElementRestriction:
    """Gather/scatter maps as device arrays. Built once per (space, subset)."""

    ndof: int                 # scalar L-vector length
    gather: jnp.ndarray       # (ne, nd) int32
    perm: jnp.ndarray         # (ne*nd,) E-slot permutation sorting by L-dof
    seg_ids: jnp.ndarray      # (ne*nd,) sorted destination L-dofs

    @staticmethod
    def from_map(gather_map: np.ndarray, ndof: int) -> "ElementRestriction":
        from ..utils.config import index_t
        from ..utils.native import counting_argsort

        flat = gather_map.reshape(-1).astype(np.int64)
        perm = counting_argsort(flat, int(ndof) + 1)
        seg = flat[perm]
        return ElementRestriction(
            ndof=int(ndof),
            gather=jnp.asarray(gather_map, dtype=index_t()),
            perm=jnp.asarray(perm, dtype=index_t()),
            seg_ids=jnp.asarray(seg, dtype=index_t()),
        )

    @staticmethod
    def for_space(fes) -> "ElementRestriction":
        return ElementRestriction.from_map(fes.gather_map, fes.ndof_scalar)

    # ------------------------------------------------------------------
    def mult(self, u: jnp.ndarray) -> jnp.ndarray:
        """L→E: (ndof, ...) → (ne, nd, ...)."""
        return u[self.gather]

    def mult_transpose(self, u_e: jnp.ndarray) -> jnp.ndarray:
        """E→L scatter-add: (ne, nd, ...) → (ndof, ...), deterministic."""
        ne, nd = self.gather.shape
        flat = u_e.reshape(ne * nd, *u_e.shape[2:])
        vals = flat[self.perm]
        return jax.ops.segment_sum(
            vals, self.seg_ids, num_segments=self.ndof, indices_are_sorted=True
        )

    def mult_t(self, u: jnp.ndarray) -> jnp.ndarray:
        """L→E in transposed (lane-major) layout: (ndof,) → (nd, ne).
        The layout the lane-major applies consume (ops/lanemajor.py)."""
        return self.mult(u).T

    def mult_transpose_t(self, u_eT: jnp.ndarray) -> jnp.ndarray:
        """E→L scatter-add from transposed layout: (nd, ne) → (ndof,)."""
        return self.mult_transpose(u_eT.T)

    def counts(self) -> jnp.ndarray:
        """Multiplicity of each L-dof (how many E-slots map to it)."""
        ne, nd = self.gather.shape
        ones = jnp.ones(ne * nd, dtype=jnp.int32)
        return jax.ops.segment_sum(
            ones, self.seg_ids, num_segments=self.ndof, indices_are_sorted=True
        )


jax.tree_util.register_pytree_node(
    ElementRestriction,
    lambda r: ((r.gather, r.perm, r.seg_ids), (r.ndof,)),
    lambda aux, ch: ElementRestriction(
        ndof=aux[0], gather=ch[0], perm=ch[1], seg_ids=ch[2]),
)


def _use_fast() -> bool:
    from ..utils.config import config

    if config.fast_restriction == "on":
        return True
    if config.fast_restriction == "off":
        return False
    return jax.default_backend() == "tpu"


@dataclasses.dataclass(frozen=True)
class FastElementRestriction(ElementRestriction):
    """TPU block-gather restriction (see ops/block_gather.py).

    L→E and the deterministic E→L scatter-add both run as block gathers at
    ~memory bandwidth; E→L is a sum of max-multiplicity "plane" gathers
    (plane j reads the j-th E-slot of every dof), replacing the
    segment-sum whose XLA lowering is ~1500× off roofline on TPU.
    Vector-valued (trailing-dim) inputs fall back to the base path.
    """

    tg: object = None          # BlockGatherTables, L→E (element-major)
    ts: object = None          # tuple of multi-plane tables, E→L
    tgT: object = None         # BlockGatherTables, L→E transposed (nd, ne)
    tsT: object = None         # tuple of multi-plane tables, (nd, ne)→L
    # scan-scatter (high-multiplicity meshes): E→L as perm-gather →
    # segmented Hillis-Steele suffix-sum (log2(max_mult) shifted adds,
    # pure elementwise XLA) → head gather.  Beats the multiplicity-plane
    # kernel whenever the planes don't fit one table (tets: mult ≤ ~42,
    # measured 13 ms/plane-scatter vs ~1 ms for this path at 786k slots).
    t_perm: object = None      # block-gather table for e_flat[perm]
    t_head: object = None      # block-gather table for x[starts]
    t_permT: object = None     # same pair for the (nd, ne) flattening
    t_headT: object = None
    max_mult: int = 0

    #: planes per scatter table: the Pallas kernel fully unrolls K×J
    #: lane-gather/selects, so high-multiplicity meshes (tet vertices touch
    #: ~24 elements vs 8 for hexes) must be chunked or the register
    #: allocator spills out of VMEM (observed 134 MB of spill slots at
    #: J=24 on v5e); groups of ≤8 keep each call in the hex-sized regime.
    J_MAX = 8
    #: max distinct source blocks per 128-output row: beyond this the kernel
    #: blows the 16 MB scoped-VMEM stack (observed K=190 on an element-major
    #: tet gather) — such tables are discarded and the op falls back to the
    #: XLA gather/segment-sum base path.  The transposed (nd, ne) layout is
    #: the structural fix: one local dof across 128 consecutive elements has
    #: lattice-like locality whenever elements are numbered coherently
    #: (Morton/lex order), keeping K near the hex regime.
    K_MAX = 40

    @staticmethod
    def from_map(gather_map: np.ndarray, ndof: int) -> "FastElementRestriction":
        from ..ops import block_gather as bg
        from ..utils.native import counting_argsort

        base = ElementRestriction.from_map(gather_map, ndof)
        gm = np.asarray(gather_map).astype(np.int64)
        jm = FastElementRestriction.J_MAX
        km = FastElementRestriction.K_MAX

        def build_gather(flat):
            t = bg.build_tables(flat, ndof)
            return None if t.K > km else t

        def build_scatter(flat):
            """(plane-table tuple | None, perm-table | None) for one
            E-flattening.  Low-multiplicity maps (hexes: ≤8 planes) use the
            single fused multiplicity-plane kernel; anything that doesn't
            fit one table falls through to the scan-scatter path."""
            nidx = flat.size
            order = counting_argsort(flat, int(ndof) + 1)
            counts = np.bincount(flat, minlength=ndof)
            starts = np.zeros(ndof + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            mult = int(counts.max())
            ts = None
            if mult <= jm:
                planes = []
                for k in range(mult):
                    gj = np.full(ndof, nidx, dtype=np.int64)  # sentinel → 0
                    sel = counts > k
                    gj[sel] = order[starts[:-1][sel] + k]
                    planes.append(gj)
                t = bg.build_tables(planes, nidx)
                if t.K <= km:
                    ts = (t,)
            t_perm = build_gather_idx(order, nidx)
            return ts, t_perm, starts[:-1], mult

        def build_gather_idx(idx, nsrc):
            t = bg.build_tables(idx, nsrc)
            return None if t.K > km else t

        flat = gm.reshape(-1)
        flatT = gm.T.reshape(-1).copy()
        tg = build_gather(flat)
        tgT = build_gather(flatT)
        ts, t_perm, starts, mult = build_scatter(flat)
        tsT, t_permT, _, _ = build_scatter(flatT)
        # zero-multiplicity dofs must read a zero, not the next dof's
        # segment head: point them at a sentinel slot past the data
        # (the scan path pads x with one trailing zero before this gather)
        heads = starts.copy()
        heads[np.bincount(flat, minlength=ndof) == 0] = flat.size
        t_head = build_gather_idx(heads, flat.size + 1)
        return FastElementRestriction(
            ndof=base.ndof, gather=base.gather, perm=base.perm,
            seg_ids=base.seg_ids, tg=tg, ts=ts, tgT=tgT, tsT=tsT,
            t_perm=t_perm, t_head=t_head, t_permT=t_permT, t_headT=t_head,
            max_mult=mult,
        )

    def mult(self, u: jnp.ndarray) -> jnp.ndarray:
        if u.ndim != 1 or self.tg is None:
            return super().mult(u)
        from ..ops import block_gather as bg

        ne, nd = self.gather.shape
        return bg.apply(u, self.tg).reshape(ne, nd)

    def _segscan_heads(self, x):
        """Segmented Hillis-Steele suffix sum over the dof-sorted slot array
        (log2(max_mult) shifted elementwise adds), then head gather: the
        deterministic E→L reduction for high-multiplicity meshes."""
        from ..ops import block_gather as bg

        seg = self.seg_ids
        s = 1
        while s < self.max_mult:
            same = seg[:-s] == seg[s:]
            x = x + jnp.concatenate(
                [jnp.where(same, x[s:], 0), jnp.zeros((s,), x.dtype)]
            )
            s *= 2
        # trailing zero = the sentinel slot zero-multiplicity dofs read
        x = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        return bg.apply(x, self.t_head)

    def mult_transpose(self, u_e: jnp.ndarray) -> jnp.ndarray:
        if u_e.ndim != 2:
            return super().mult_transpose(u_e)
        from ..ops import block_gather as bg

        flat = u_e.reshape(-1)
        if self.ts is not None:
            return bg.apply(flat, self.ts[0])
        if self.t_perm is not None and self.t_head is not None:
            return self._segscan_heads(bg.apply(flat, self.t_perm))
        return super().mult_transpose(u_e)

    # -- transposed (lane-major) E-layout ------------------------------
    def mult_t(self, u: jnp.ndarray) -> jnp.ndarray:
        if u.ndim != 1 or self.tgT is None:
            return self.mult(u).T
        from ..ops import block_gather as bg

        ne, nd = self.gather.shape
        return bg.apply(u, self.tgT).reshape(nd, ne)

    def mult_transpose_t(self, u_eT: jnp.ndarray) -> jnp.ndarray:
        if u_eT.ndim != 2:
            return self.mult_transpose(jnp.transpose(u_eT))
        from ..ops import block_gather as bg

        flat = u_eT.reshape(-1)
        if self.tsT is not None:
            return bg.apply(flat, self.tsT[0])
        if self.t_permT is not None and self.t_head is not None:
            return self._segscan_heads(bg.apply(flat, self.t_permT))
        return self.mult_transpose(jnp.transpose(u_eT))


def make_restriction(gather_map: np.ndarray, ndof: int) -> ElementRestriction:
    """Platform-appropriate restriction (fast block-gather on TPU)."""
    if _use_fast():
        return FastElementRestriction.from_map(np.asarray(gather_map), ndof)
    return ElementRestriction.from_map(np.asarray(gather_map), ndof)


jax.tree_util.register_pytree_node(
    FastElementRestriction,
    lambda r: (
        (r.gather, r.perm, r.seg_ids, r.tg, r.ts, r.tgT, r.tsT,
         r.t_perm, r.t_head, r.t_permT, r.t_headT),
        (r.ndof, r.max_mult),
    ),
    lambda aux, ch: FastElementRestriction(
        ndof=aux[0], gather=ch[0], perm=ch[1], seg_ids=ch[2],
        tg=ch[3], ts=ch[4], tgT=ch[5], tsT=ch[6],
        t_perm=ch[7], t_head=ch[8], t_permT=ch[9], t_headT=ch[10],
        max_mult=aux[1],
    ),
)
