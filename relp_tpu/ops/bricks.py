"""Tiled-brick sparse device matrix — the TPU-shaped SpMV layout.

Why: TPU element gathers are serial (~14 ns per gathered element measured
on DFL001's ELL arrays — tools/probe_gather_layouts.py: a dependent
1.57M-element gather costs 21 ms, while gathering the same data as
49k×128-lane ROWS costs 427 µs).  The reference's CSC/CSR sparse vectors
(src/data/linear_algebra/matrix.rs:23-77) assume cheap random access and
do not map to this hardware; this layout re-shapes the nonzeros so every
memory access is a 128-lane row gather or a streaming read:

- nonzeros are grouped into (tr × tc) = (8 × 128) dense **bricks** on the
  (row-tile, column-block) grid;
- per row-tile, the touched column blocks' bricks sit in a padded slot
  array ``data[T, B, tr, tc]`` with block ids ``idx[T, B]`` (empty slots
  are zero bricks pointing at block 0 — harmless);
- ``A·x`` gathers x as 128-lane blocks (``take(x.reshape(-1, tc), idx,
  axis=0)`` — the fast layout) and contracts with the bricks on the VPU
  in exact f64: ``y[t, r] = Σ_{b,l} data[t,b,r,l]·x_blk[t,b,l]``;
- ``πᵀA`` uses an independently-built transposed brick set (column tiles
  of 8, row blocks of 128), same contraction shape.

Values are an exact f64 re-layout — no precision compromise anywhere.
Storage is O(bricks·1024·8B); scattered matrices (DFL001) shrink ~3× under
a bipartite reverse-Cuthill-McKee permutation (:func:`bandwidth_perm`),
which callers apply to the problem before building.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from relp_tpu.ops.amatrix import _pin

TR = 8      # rows per tile (sublane granularity)
TC = 128    # columns per block (lane granularity)


def _slot_layout(r, c, v, n_rows_pad: int, n_cols_pad: int, b_pad=None):
    """Pack COO triplets into (data[T, B, TR, TC], idx[T, B]) numpy arrays."""
    T = n_rows_pad // TR
    NB = n_cols_pad // TC
    t = (r // TR).astype(np.int64)
    blk = (c // TC).astype(np.int64)
    key = t * NB + blk
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, inv_s = np.unique(key_s, return_inverse=True)
    tile_of = (uniq // NB).astype(np.int64)
    starts = np.searchsorted(tile_of, np.arange(T))
    slot_of_uniq = np.arange(len(uniq)) - starts[tile_of]
    b_true = int(slot_of_uniq.max()) + 1 if len(uniq) else 1
    B = max(b_true, 1) if b_pad is None else b_pad
    assert b_true <= B, f"tile with {b_true} bricks exceeds B={B}"
    data = np.zeros((T, B, TR, TC), dtype=np.float64)
    idx = np.zeros((T, B), dtype=np.int32)
    idx[tile_of, slot_of_uniq] = (uniq % NB).astype(np.int32)
    slot = slot_of_uniq[inv_s]
    ro, co, vo = r[order], c[order], v[order]
    data[ro // TR, slot, ro % TR, co % TC] = vo
    return data, idx


@jax.tree_util.register_pytree_node_class
class BrickMatrix:
    """Brick-tiled A for streaming SpMV (see module docstring).

    ``rdata[T, Br, 8, 128]``/``ridx[T, Br]``: row-tile bricks for A·x.
    ``cdata[Tc, Bc, 8, 128]``/``cidx[Tc, Bc]``: column-tile bricks (the
    8 axis is columns, the 128 axis row-lanes) for πᵀA.
    ``m``/``n`` are the padded logical dims (static aux)."""

    def __init__(self, rdata, ridx, cdata, cidx, m: int, n: int):
        self.rdata = rdata
        self.ridx = ridx
        self.cdata = cdata
        self.cidx = cidx
        self.m = m
        self.n = n

    def tree_flatten(self):
        return (self.rdata, self.ridx, self.cdata, self.cidx), (self.m, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.rdata.dtype

    def matvec(self, x):
        """A @ x: row gather of x column-blocks + exact f64 VPU contraction."""
        tab = _pin(x).reshape(self.n // TC, TC)
        g = jnp.take(tab, self.ridx, axis=0)            # [T, Br, TC]
        y = jnp.sum(self.rdata * g[:, :, None, :], axis=(1, 3))
        return y.reshape(self.m)

    def rmatvec(self, pi):
        """πᵀ A via the transposed brick set."""
        tab = _pin(pi).reshape(self.m // TC, TC)
        g = jnp.take(tab, self.cidx, axis=0)            # [Tc, Bc, TC]
        z = jnp.sum(self.cdata * g[:, :, None, :], axis=(1, 3))
        return z.reshape(self.n)


def bricks_from_csc(
    csc, m_pad: int, n_pad: int, br_pad=None, bc_pad=None, bucket=None
) -> BrickMatrix:
    """Build both brick orientations from a scipy CSC matrix.

    ``m_pad``/``n_pad`` must be multiples of 128 (the driver's shape
    buckets above 256 all are).  ``br_pad``/``bc_pad`` optionally pad the
    per-tile brick-slot counts; ``bucket`` (a callable on the true max
    count) derives them instead — bucket like the other padded dims so
    problems share compiled programs."""
    assert m_pad % TC == 0 and n_pad % TC == 0, (m_pad, n_pad)
    coo = csc.tocoo()
    coo.sum_duplicates()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data.astype(np.float64)
    if bucket is not None:
        br_pad = bucket(_slot_count(r, c, m_pad, n_pad))
        bc_pad = bucket(_slot_count(c, r, n_pad, m_pad))
    rdata, ridx = _slot_layout(r, c, v, m_pad, n_pad, br_pad)
    cdata, cidx = _slot_layout(c, r, v, n_pad, m_pad, bc_pad)
    return BrickMatrix(rdata, ridx, cdata, cidx, m_pad, n_pad)


def _slot_count(r, c, n_rows_pad: int, n_cols_pad: int) -> int:
    """Max bricks in any row-tile (the true B before padding)."""
    if len(r) == 0:
        return 1
    NB = n_cols_pad // TC
    key = (r // TR).astype(np.int64) * NB + (c // TC)
    uniq = np.unique(key)
    per_tile = np.bincount(uniq // NB, minlength=n_rows_pad // TR)
    return int(per_tile.max())


def bandwidth_perm(csc):
    """Bipartite reverse-Cuthill-McKee row/column orders for A.

    Returns ``(row_perm, col_perm)`` such that ``A[row_perm][:, col_perm]``
    clusters nonzeros near the diagonal — on DFL001 this shrinks the brick
    count 2.9× (25522 → 8929) and the max bricks-per-tile 78 → 28.  Cheap:
    one BFS over the bipartite adjacency (O(nnz))."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m, n = csc.shape
    B = sp.bmat([[None, csc], [csc.T, None]], format="csr")
    perm = np.asarray(reverse_cuthill_mckee(B, symmetric_mode=True))
    row_perm = perm[perm < m]
    col_perm = perm[perm >= m] - m
    # isolated rows/columns (empty in A) may be missing from the BFS order
    if row_perm.size < m:
        seen = np.zeros(m, bool)
        seen[row_perm] = True
        row_perm = np.concatenate([row_perm, np.flatnonzero(~seen)])
    if col_perm.size < n:
        seen = np.zeros(n, bool)
        seen[col_perm] = True
        col_perm = np.concatenate([col_perm, np.flatnonzero(~seen)])
    return row_perm.astype(np.int64), col_perm.astype(np.int64)
