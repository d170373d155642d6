"""NEGATIVE RESULT (round 4, kept runnable): sorted sparse-to-dense
expansion as MXU one-hot matmuls — correct, but 4x SLOWER than the XLA
sorted-unique scatter it tried to replace.

Motivation: the JPEG transports (ops/jpeg.py) reconstruct dense
coefficient tensors from sorted unique (position, value) streams, and
XLA's ``.at[pos].set`` costs ~7 ns/entry on the v5e (per-ENTRY bound:
int8 vs int16 identical, half the entries = half the time) — ~130
us/frame at 480p sparsity, 10x the dequant+IDCT it feeds. The classic
TPU answer is scatter-as-matmul: view the dense tensor as
``(n_tiles, ROWS, LANES)`` tiles; each tile is the product of two
one-hots built from its contiguous (positions are sorted!) entry slice:

    tile[r, l] = sum_e val[e] * [row[e] == r] * [lane[e] == l]
               = R^T @ VL       # (W, ROWS)^T @ (W, LANES) — one MXU dot

with per-tile slice bounds (device searchsorted) riding scalar prefetch
to pick the two W-entry window blocks per program, and a cond-gated
``.at[].add`` fallback for tiles overflowing the W budget. Output is
BITWISE identical to the scatter (verified on-chip).

Measured (B=16, 480p sparsity, chained): **639 us/frame vs 156 for the
scatter**. Why it cannot win: the dot FLOPs are fine, but BUILDING the
one-hots costs ~(ROWS + LANES) vector-element ops per loaded entry slot,
and the aligned two-block window loads ~2x the tile's mean entry count —
in total ~4 * E * (ROWS + LANES) ≈ 10G vector elems per 256-frame batch
(~11 ms at the VPU's ~1G elems/ms), before per-grid-step overheads.
Shrinking LANES shrinks the build but starves the MXU (M=32 is 25%
utilization); growing tiles grows W and the window slack. Every corner
of the (ROWS, LANES, W) space lands at or above the scatter's cost.
Keep the scatter; the DC lane of the split transport (ops/jpeg.py)
already removes a quarter of the entries by construction, which IS the
productive direction — ship fewer scattered entries, not a fancier
scatter.

Run: JAX_PLATFORMS=cpu python benchmarks/scatter_onehot_kernel.py (parity
in interpret mode); on TPU it also times kernel vs scatter.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32          # tile rows (second-to-last dim; 8-aligned)
LANES = 512        # tile lanes (128-aligned)
SLOTS = ROWS * LANES
W = 2048           # entry-window block (per-tile entry budget)


def _kernel(starts_ref, pos_a, val_a, pos_b, val_b, out_ref):
    i = pl.program_id(0)
    s = starts_ref[i]
    e = jnp.minimum(starts_ref[i + 1], s + W)  # > W entries -> host fallback
    base = (s // W) * W
    tile_base = i * SLOTS

    def half(pos_ref, val_ref, off):
        # Entry blocks are (W, 1): every per-entry quantity is a (W, 1)
        # column that broadcasts against (W, X) iotas — no transposes, no
        # cross-lane reshapes (Mosaic rejects (1, W) blocks and lowers
        # (W, 1)->(1, W) relayouts poorly).
        eidx = base + off + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        mask = (eidx >= s) & (eidx < e)
        pos = jnp.where(mask, pos_ref[0] - tile_base, -1)
        val = jnp.where(mask, val_ref[0].astype(jnp.bfloat16),
                        jnp.bfloat16(0.0))
        lane = jnp.where(mask, pos & (LANES - 1), -1)
        row = pos >> 9  # log2(LANES); -1 rows never match the iota below
        # R: (W, ROWS) one-hot of each entry's row; VL: (W, LANES) value at
        # each entry's lane. Both exact in bf16 (|val| <= 127, weights 0/1).
        # Built as compare->float->multiply: jnp.where with (W, 1) column
        # operands makes Mosaic relayout an i1 (W, LANES) vector to
        # lane-replicated form, which it refuses; float multiplies by a
        # column broadcast fine.
        r1 = (jax.lax.broadcasted_iota(jnp.int32, (W, ROWS), 1)
              == row).astype(jnp.bfloat16)
        vl = (jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
              == lane).astype(jnp.bfloat16) * val
        # Contract the shared W axis: (W, ROWS)^T @ (W, LANES).
        return jax.lax.dot_general(r1, vl, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    out_ref[...] = half(pos_a, val_a, 0) + half(pos_b, val_b, W)


@functools.partial(jax.jit, static_argnames=("total", "interpret"))
def expand_sorted(pos: jnp.ndarray, val: jnp.ndarray, total: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Strictly-increasing unique ``pos``/``val`` entry streams -> dense
    ``(total,)`` float32 (zeros elsewhere). Out-of-range positions drop.

    Entries must be sorted; values must fit int8 range (the JPEG transports
    guarantee both). Bitwise-equal to
    ``jnp.zeros(total).at[pos].set(val)`` with the drop/unique/sorted
    flags — but SLOWER than it on the v5e (see the module docstring).
    """
    n_tiles = -(-total // SLOTS)
    e_pad = (-(-(pos.size + 1) // W) + 1) * W  # +1 block: j+1 always valid
    pos_p = jnp.full(e_pad, np.int32(2 ** 31 - 1), jnp.int32)
    pos_p = pos_p.at[: pos.size].set(pos.astype(jnp.int32))
    val_p = jnp.zeros(e_pad, val.dtype).at[: val.size].set(val)
    # Out-of-range (dropped) entries must not land in any tile: clamp their
    # position past the padded grid so searchsorted buckets them after the
    # last edge.
    edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * SLOTS
    starts = jnp.searchsorted(pos_p, edges, side="left").astype(jnp.int32)

    pos2 = pos_p.reshape(-1, W, 1)
    val2 = val_p.reshape(-1, W, 1)
    nblk = pos2.shape[0]
    spec_a = pl.BlockSpec(
        (1, W, 1), lambda i, st: (jnp.minimum(st[i] // W, nblk - 1), 0, 0),
        memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec(
        (1, W, 1),
        lambda i, st: (jnp.minimum(st[i] // W + 1, nblk - 1), 0, 0),
        memory_space=pltpu.VMEM)
    dense = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[spec_a, spec_a, spec_b, spec_b],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i, st: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
        interpret=interpret,
    )(starts, pos2, val2, pos2, val2).reshape(-1)[:total]

    # Overflow remainder (tiles with > W entries): correct-but-slow path,
    # entered only when it actually happens.
    counts = jnp.diff(starts)

    def slow_fixup(d):
        rank = (jnp.arange(pos_p.size, dtype=jnp.int32)
                - starts[jnp.clip(pos_p // SLOTS, 0, n_tiles - 1)])
        over = rank >= W
        fix_pos = jnp.where(over, pos_p, 2 ** 31 - 1)
        # Masked-out entries jump to int32 max, so the index sequence is no
        # longer globally sorted — no sorted/unique hints here (slow path).
        return d.at[fix_pos].add(val_p.astype(jnp.float32), mode="drop")

    return jax.lax.cond(counts.max() > W, slow_fixup, lambda d: d, dense)


def _parity():
    rng = np.random.default_rng(0)
    for total, nnz, name in ((SLOTS * 3, 500, "small sparse"),
                             (SLOTS * 3 + 1000, 700, "ragged total"),
                             (SLOTS * 2, SLOTS // 4, "dense-ish"),
                             (SLOTS, 40, "single tile")):
        pos = np.sort(rng.choice(total + 500, size=nnz,
                                 replace=False)).astype(np.int32)
        val = rng.integers(-127, 128, nnz).astype(np.int8)
        val[val == 0] = 3
        ref = np.zeros(total, np.float32)
        m = pos < total
        ref[pos[m]] = val[m]
        interp = jax.default_backend() != "tpu"
        out = np.asarray(expand_sorted(jnp.asarray(pos), jnp.asarray(val),
                                       total, interpret=interp))
        assert (out == ref).all(), name
        print(f"{name}: parity ok")
    pos = np.arange(W + 200, dtype=np.int32) * 2  # one tile past the budget
    val = np.full(pos.size, 5, np.int8)
    total = SLOTS * 2
    ref = np.zeros(total, np.float32)
    ref[pos[pos < total]] = 5
    out = np.asarray(expand_sorted(jnp.asarray(pos), jnp.asarray(val), total,
                                   interpret=jax.default_backend() != "tpu"))
    assert (out == ref).all()
    print("overflow fallback: parity ok")


def _bench(B: int = 16):
    import time
    total = B * 4800 * 64
    rng = np.random.default_rng(0)
    nnz = B * 19000
    pos = np.sort(rng.choice(total, size=nnz, replace=False)).astype(np.int32)
    val = rng.integers(-127, 128, nnz).astype(np.int8)
    val[val == 0] = 3
    jp, jv = jnp.asarray(pos), jnp.asarray(val)

    def scatter(v):
        return jnp.zeros(total, jnp.int16).at[jp].set(
            v.astype(jnp.int16), mode="drop", unique_indices=True,
            indices_are_sorted=True)

    for name, fn in (("onehot kernel",
                      lambda v: expand_sorted(jp, v, total)),
                     ("xla scatter", scatter)):
        @jax.jit
        def chain(v, acc, fn=fn):
            return (v ^ (acc.astype(jnp.int8) & 1),
                    fn(v).sum().astype(jnp.float32))
        v, acc = jv, jnp.float32(0)
        v, acc = chain(v, acc)
        jax.block_until_ready((v, acc))
        t0 = time.perf_counter()
        for _ in range(6):
            v, acc = chain(v, acc)
        float(acc)
        print(f"{name}: {(time.perf_counter() - t0) * 1e6 / (6 * B):.1f} "
              "us/frame")


if __name__ == "__main__":
    _parity()
    if jax.default_backend() == "tpu":
        _bench()
