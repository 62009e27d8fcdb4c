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

        def build_pair(flat):
            """(gather table, scatter-table tuple) for one E-flattening, or
            None where the block structure is too scattered (K guard)."""
            nidx = flat.size
            tg = bg.build_tables(flat, ndof)
            if tg.K > km:
                tg = None
            order = counting_argsort(flat, int(ndof) + 1)
            counts = np.bincount(flat, minlength=ndof)
            starts = np.zeros(ndof + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            planes = []
            for k in range(int(counts.max())):
                gj = np.full(ndof, nidx, dtype=np.int64)  # sentinel -> zero
                sel = counts > k
                gj[sel] = order[starts[:-1][sel] + k]
                planes.append(gj)
            # adaptive grouping: take up to J_MAX planes per table, bisecting
            # while the union block count K exceeds the VMEM-safe bound
            # (high-multiplicity Delaunay vertices push early groups over)
            ts, i, ok = [], 0, True
            while i < len(planes):
                j = min(len(planes), i + jm)
                while True:
                    t = bg.build_tables(planes[i:j], nidx)
                    if t.K <= km or j == i + 1:
                        break
                    j = i + max(1, (j - i) // 2)
                if t.K > km:
                    ok = False
                    break
                ts.append(t)
                i = j
            return tg, tuple(ts) if ok else None

        tg, ts = build_pair(gm.reshape(-1))
        tgT, tsT = build_pair(gm.T.reshape(-1).copy())
        return FastElementRestriction(
            ndof=base.ndof, gather=base.gather, perm=base.perm,
            seg_ids=base.seg_ids, tg=tg, ts=ts, tgT=tgT, tsT=tsT,
        )

    def mult(self, u: jnp.ndarray) -> jnp.ndarray:
        if u.ndim != 1 or self.tg is None:
            return super().mult(u)
        from ..ops import block_gather as bg

        ne, nd = self.gather.shape
        return bg.apply(u, self.tg).reshape(ne, nd)

    def mult_transpose(self, u_e: jnp.ndarray) -> jnp.ndarray:
        if u_e.ndim != 2 or self.ts is None:
            if u_e.ndim == 2 and self.tsT is not None:
                return self._scatter_T(jnp.transpose(u_e))
            return super().mult_transpose(u_e)
        from ..ops import block_gather as bg

        flat = u_e.reshape(-1)
        out = bg.apply(flat, self.ts[0])
        for t in self.ts[1:]:
            out = out + bg.apply(flat, t)
        return out

    # -- transposed (lane-major) E-layout ------------------------------
    def mult_t(self, u: jnp.ndarray) -> jnp.ndarray:
        if u.ndim != 1 or self.tgT is None:
            return self.mult(u).T
        from ..ops import block_gather as bg

        ne, nd = self.gather.shape
        return bg.apply(u, self.tgT).reshape(nd, ne)

    def _scatter_T(self, u_eT):
        from ..ops import block_gather as bg

        flat = u_eT.reshape(-1)
        out = bg.apply(flat, self.tsT[0])
        for t in self.tsT[1:]:
            out = out + bg.apply(flat, t)
        return out

    def mult_transpose_t(self, u_eT: jnp.ndarray) -> jnp.ndarray:
        if u_eT.ndim != 2 or self.tsT is None:
            return self.mult_transpose(jnp.transpose(u_eT))
        return self._scatter_T(u_eT)


def make_restriction(gather_map: np.ndarray, ndof: int) -> ElementRestriction:
    """Platform-appropriate restriction (fast block-gather on TPU)."""
    if _use_fast():
        return FastElementRestriction.from_map(np.asarray(gather_map), ndof)
    return ElementRestriction.from_map(np.asarray(gather_map), ndof)
