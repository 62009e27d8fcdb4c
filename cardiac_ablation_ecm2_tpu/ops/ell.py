"""ELL-format SpMV at block-gather speed — the p1-simplex fast path.

At order 1 on simplex meshes every dof is a vertex dof with multiplicity up
to ~25 (tets), so the matrix-free L→E→Q→E→L pipeline is scatter-bound:
measured 2.7 MDof/s BP1 vs ~70 at p2 (BASELINE.md BP table).  But a p1
operator is also a TINY sparse matrix (nnz/row ≈ 15 — the reference runs
its own LEGACY/FULL CSR path at p1, ``fem/bilinearform.cpp``), and an SpMV
in row-major ELL form

    y[i] = Σ_j vals[i, j] · x[cols[i, j]]          (j < J = max nnz/row)

has NO scatter at all: it is J fixed gathers + a weighted sum.  The gathers
run through the same 128-row-block + in-register lane-gather decomposition
as :mod:`.block_gather` (XLA scalar gathers are ~1500× off roofline; whole
128-lane rows + Mosaic ``take_along_axis`` run at memory speed), with one
extra weight plane per gather plane multiplied in-register.

Reference analog: ``SparseMatrix::Mult`` device path
(``linalg/sparsemat.cpp``) — rebuilt TPU-first as a dense-tiled weighted
gather instead of CSR row loops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .block_gather import BlockGatherTables, _pad_src, build_tables
from .operators import LinearOperator


@dataclasses.dataclass(frozen=True)
class ELLOperator:
    """Square sparse operator in ELL layout, applied as weighted gathers.

    Registered as a pytree so it can ride as a jit ARGUMENT (closed-over
    device arrays become MLIR constants — hostile at scale)."""

    tables: BlockGatherTables
    wts: jnp.ndarray          # (J, B, 128) weight planes, codes-aligned
    diag: jnp.ndarray         # (n,)

    @property
    def shape(self):
        return (self.tables.nout, self.tables.nsrc)

    @staticmethod
    def from_csr(A, dtype="float32") -> "ELLOperator":
        """Build from a scipy CSR/CSC/COO matrix (host, setup time)."""
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n, m = A.shape
        nnz = np.diff(A.indptr)
        J = int(nnz.max()) if n else 0
        cols = np.full((J, n), m, dtype=np.int64)      # m == "reads zero"
        vals = np.zeros((J, n), dtype=np.float64)
        rows = np.repeat(np.arange(n), nnz)
        slot = np.arange(A.indptr[-1]) - np.repeat(A.indptr[:-1], nnz)
        cols[slot, rows] = A.indices
        vals[slot, rows] = A.data
        t = build_tables(list(cols), m)
        B = t.codes.shape[1]
        wpad = np.zeros((J, B * 128), dtype=np.dtype(dtype))
        wpad[:, :n] = vals
        return ELLOperator(
            tables=t, wts=jnp.asarray(wpad.reshape(J, B, 128)),
            diag=jnp.asarray(A.diagonal().astype(np.dtype(dtype))),
        )

    def mult(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self.tables
        interpret = jax.default_backend() != "tpu"
        return _apply_w(x, t.blk, t.codes, self.wts, nsrc_rows=t.nsrc_rows,
                        K=t.K, J=t.J, nout=t.nout, interpret=interpret)

    def diagonal(self) -> jnp.ndarray:
        return self.diag

    def operator(self) -> LinearOperator:
        return LinearOperator(shape=self.shape, mult=self.mult,
                              diagonal_fn=self.diagonal)


jax.tree_util.register_pytree_node(
    ELLOperator,
    lambda t: ((t.tables, t.wts, t.diag), None),
    lambda aux, ch: ELLOperator(tables=ch[0], wts=ch[1], diag=ch[2]),
)


def _kernel_w(*refs, K, J):
    # refs = K source planes (RB,128), J code planes, J weight planes, out
    w_refs = refs[:K]
    c_refs = refs[K:K + J]
    v_refs = refs[K + J:K + 2 * J]
    out_ref = refs[-1]
    acc = None
    for j in range(J):
        code = c_refs[j][...].astype(jnp.int32)
        lane = jnp.bitwise_and(code, 127)
        sel = jnp.right_shift(code, 7)
        pj = jnp.take_along_axis(w_refs[0][...], lane, axis=1)
        for k in range(1, K):
            gk = jnp.take_along_axis(w_refs[k][...], lane, axis=1)
            pj = jnp.where(sel == k, gk, pj)
        pj = pj * v_refs[j][...]
        acc = pj if acc is None else acc + pj
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("nsrc_rows", "K", "J", "nout",
                                             "interpret", "row_block"))
def _apply_w(src, blk, codes, wts, *, nsrc_rows, K, J, nout,
             interpret=False, row_block=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    src2 = _pad_src(src, nsrc_rows)
    B = codes.shape[1]
    W = src2[blk]                            # (K, B, 128) plane-major
    if row_block is None:
        csz = codes.dtype.itemsize
        per_row = 2 * 128 * (K * src.dtype.itemsize + J * csz
                             + J * wts.dtype.itemsize + src.dtype.itemsize)
        # floor of 8 (f32 sublane tile), not 64: high-K calls (heavy-row
        # ELL buckets, K ~ 100+) blow the 16 MB scoped-VMEM stack at RB=64
        row_block = max(8, min(1024, (2 * 2 ** 20 // per_row) // 8 * 8))
    RB = min(row_block, B)
    nblk = (B + RB - 1) // RB
    if B % RB:
        padb = nblk * RB - B
        W = jnp.concatenate(
            [W, jnp.zeros((K, padb, 128), W.dtype)], axis=1)
        codes = jnp.concatenate(
            [codes, jnp.zeros((J, padb, 128), codes.dtype)], axis=1)
        wts = jnp.concatenate(
            [wts, jnp.zeros((J, padb, 128), wts.dtype)], axis=1)
    planes = (tuple(W[k] for k in range(K))
              + tuple(codes[j] for j in range(J))
              + tuple(wts[j].astype(src.dtype) for j in range(J)))
    spec2d = pl.BlockSpec((RB, 128), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_w, K=K, J=J),
            grid=(nblk,),
            in_specs=[spec2d] * (K + 2 * J),
            out_specs=spec2d,
            out_shape=jax.ShapeDtypeStruct((nblk * RB, 128), src.dtype),
            interpret=interpret,
        )(*planes)
    return out.reshape(-1)[:nout]


# ----------------------------------------------------------------------
# bucketed multi-ELL: variable row widths without global-J padding
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MultiELLOperator:
    """Sparse operator as nnz-bucketed ELL slabs, NATURAL dof space.

    Higher-order simplex matrices have wildly variable row widths (o2 tets:
    mean 28, max 115 nnz/row) — one global-J ELL pads 4× and the J·K-unrolled
    kernel blows VMEM.  Here ROWS are grouped into same-width buckets (each a
    stack of ≤``chunk_j``-plane weighted-gather calls over its own output
    slice) while COLUMNS and the input vector stay in the NATURAL first-touch
    numbering — renumbering columns was measured to fragment source locality
    (per-row source-block unions K≈112 → Mosaic VMEM-stack OOM).  One final
    block-gather unpermutes the concatenated bucket outputs back to natural
    row order (2 extra n-sized streams per apply — noise next to the nnz
    traffic), so callers see a plain natural-space operator.
    """

    buckets: tuple            # of (tables, wts) chunk tuples per bucket
    sizes: tuple              # rows per bucket (sum = n)
    t_un: object              # block-gather table: permuted y -> natural y
    diag: jnp.ndarray         # (n,) natural

    @property
    def shape(self):
        n = int(sum(self.sizes))
        return (n, n)

    @staticmethod
    def from_csr(A, dtype="float32", chunk_j: int = 8,
                 bucket_edges=(8, 16, 24, 32, 48, 64, 96, 128, 192, 256),
                 ) -> "MultiELLOperator":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n = A.shape[0]
        nnz = np.diff(A.indptr)
        edges = ([e for e in bucket_edges if e < int(nnz.max())]
                 + [int(nnz.max())]) if n else []
        bidx = np.searchsorted(np.asarray(edges), nnz, side="left")
        perm = np.argsort(bidx, kind="stable")     # keeps first-touch order
        rank = np.empty(n, dtype=np.int64)
        rank[perm] = np.arange(n)

        buckets, sizes = [], []
        for b, edge in enumerate(edges):
            rows = perm[bidx[perm] == b]
            nb = len(rows)
            if nb == 0:
                continue
            J = int(edge)
            cols = np.full((J, nb), n, dtype=np.int64)   # n == "reads zero"
            vals = np.zeros((J, nb), dtype=np.float64)
            nnzr = nnz[rows]
            cum0 = np.concatenate([[0], np.cumsum(nnzr[:-1])])
            tot = int(nnzr.sum())
            rep = np.repeat(np.arange(nb), nnzr)
            slot = np.arange(tot) - np.repeat(cum0, nnzr)
            pos = np.repeat(A.indptr[rows], nnzr) + slot
            cols[slot, rep] = A.indices[pos]             # NATURAL columns
            vals[slot, rep] = A.data[pos]
            chunks = []
            for j0 in range(0, J, chunk_j):
                cj = cols[j0:j0 + chunk_j]
                vj = vals[j0:j0 + chunk_j]
                t = build_tables(list(cj), n)
                B = t.codes.shape[1]
                wpad = np.zeros((len(cj), B * 128), dtype=np.dtype(dtype))
                wpad[:, :nb] = vj
                chunks.append((t, jnp.asarray(
                    wpad.reshape(len(cj), B, 128))))
            buckets.append(tuple(chunks))
            sizes.append(nb)
        # natural[i] = concat(bucket outputs)[rank[i]]
        t_un = build_tables(rank, n)
        diag = jnp.asarray(A.diagonal().astype(np.dtype(dtype)))
        return MultiELLOperator(buckets=tuple(buckets), sizes=tuple(sizes),
                                t_un=t_un, diag=diag)

    def mult(self, x: jnp.ndarray) -> jnp.ndarray:
        from . import block_gather as bg

        interpret = jax.default_backend() != "tpu"
        outs = []
        for chunks in self.buckets:
            acc = None
            for t, wts in chunks:
                y = _apply_w(x, t.blk, t.codes, wts, nsrc_rows=t.nsrc_rows,
                             K=t.K, J=t.J, nout=t.nout, interpret=interpret)
                acc = y if acc is None else acc + y
            outs.append(acc)
        return bg.apply(jnp.concatenate(outs), self.t_un,
                        interpret=interpret)

    def diagonal(self) -> jnp.ndarray:
        return self.diag

    def operator(self) -> LinearOperator:
        return LinearOperator(shape=self.shape, mult=self.mult,
                              diagonal_fn=self.diagonal)


jax.tree_util.register_pytree_node(
    MultiELLOperator,
    lambda t: ((t.buckets, t.t_un, t.diag), (t.sizes,)),
    lambda aux, ch: MultiELLOperator(
        buckets=ch[0], t_un=ch[1], diag=ch[2], sizes=aux[0]),
)
