"""Cumulative-ablation profile of the packed-transport expand+IDCT on TPU.

The decode-fed production path's DEVICE cost is delta_idct_frames
(ops/jpeg.py): cumsum position rebuild -> sorted scatter (+ spill add) ->
dequant -> 8x8 IDCT -> block reassembly. Round-3 measured the whole chain
at ~0.75 ms/frame — 8x the detect pipeline itself — so this harness
attributes that cost stage by stage to aim the optimization.

Timing discipline (same as ablate_detect.py): per-stage timers through the
axon relay lie; every iteration CHAINS (a scalar from iteration i perturbs
iteration i+1's values) and one device->host transfer at the end forces the
chain. Stage deltas are clean; rows carry a constant dispatch overhead.

Payload realism: gap/value streams are synthesized with the production
sparsity (default ~19k nonzeros/frame at 480p q70 = round-3's measured
4.8M per 256-frame batch) and uniform random positions — the scatter and
IDCT costs depend on counts and shapes, not coefficient values.

Usage: python benchmarks/ablate_idct.py [batch] [iters] [nnz_per_frame]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_payload(batch: int, nnz_per_frame: int, bh: int = 60, bw: int = 80,
                 seed: int = 0):
    rng = np.random.default_rng(seed)
    blocks = bh * bw
    total = batch * blocks * 64
    nnz = batch * nnz_per_frame
    pos = np.sort(rng.choice(total, size=nnz, replace=False))
    deltas = np.diff(pos, prepend=-1)
    # Bridge gaps > 255 with (255, 0) fillers, exactly the native encoding.
    n_fill = int((np.maximum(deltas - 1, 0) // 255).sum())
    gaps = np.empty(nnz + n_fill, np.uint8)
    vals = np.empty(nnz + n_fill, np.int8)
    i = 0
    for d in deltas:
        while d > 255:
            gaps[i] = 255
            vals[i] = 0
            i += 1
            d -= 255
        gaps[i] = d
        vals[i] = 1
        i += 1
    v = rng.integers(-80, 80, size=i, dtype=np.int8)
    vals[:i] = np.where(vals[:i] == 0, 0, np.where(v == 0, 3, v))
    # Tiny spill stream (rare in practice).
    sgaps = np.full(64, 255, np.uint8)
    sdeltas = np.zeros(64, np.int16)
    q = np.full((batch, 64), 16, np.uint16)
    return (jnp.asarray(gaps), jnp.asarray(vals), jnp.asarray(sgaps),
            jnp.asarray(sdeltas), jnp.asarray(q))


def main(batch: int = 256, iters: int = 6, nnz_per_frame: int = 19000):
    from vision_basedsensor_tpu.ops.jpeg import _dequant_idct

    bh, bw, h, w = 60, 80, 480, 640
    gaps, vals, sgaps, sdeltas, q = make_payload(batch, nnz_per_frame, bh, bw)
    total = batch * bh * bw * 64
    print(f"payload: B={batch}, {gaps.size / batch:.0f} entries/frame")

    def expand(vals_i):
        pos = jnp.cumsum(gaps.astype(jnp.int32)) - 1
        flat = jnp.zeros(total, jnp.int16).at[pos].set(
            vals_i.astype(jnp.int16), mode="drop", unique_indices=True,
            indices_are_sorted=True)
        spos = jnp.cumsum(sgaps.astype(jnp.int32)) - 1
        return flat.at[spos].add(sdeltas, mode="drop", unique_indices=True,
                                 indices_are_sorted=True)

    stages = {
        "cumsum only": lambda vi: jnp.cumsum(gaps.astype(jnp.int32)).sum()
        + vi.astype(jnp.int32).sum(),
        "+ scatter (expand to dense int16)": lambda vi: expand(vi).sum(),
        "+ dequant+idct+assemble (full)": lambda vi: _dequant_idct(
            expand(vi).reshape(batch, bh, bw, 64).astype(jnp.float32),
            q, h, w).sum(),
    }
    # Chain: previous scalar flips value parity so the relay can't dedup.
    for name, fn in stages.items():
        @jax.jit
        def chain(vi, acc, fn=fn):
            out = fn(vi)
            return (vals ^ (acc.astype(jnp.int8) & 1)), out.astype(jnp.float32)

        vi, acc = vals, jnp.float32(0)
        vi, acc = chain(vi, acc)
        jax.block_until_ready((vi, acc))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            vi, acc = chain(vi, acc)
        float(acc)  # force
        dt = time.perf_counter() - t0
        print(f"{name:40s} {dt * 1e6 / (iters * batch):9.2f} us/frame")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
