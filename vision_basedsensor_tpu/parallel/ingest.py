"""Sharded ingest: packed JPEG coefficients feeding a device mesh per-shard.

Closes the multi-chip gap between transport and compute (VERDICT round 3,
next 4): ``parallel/mesh.py`` shards the pipeline but assumed frames were
already in HBM; the reference's one transport is the MJPEG stream/AVI
(``collecting.py:177-191``, ``marker_detection.py:52``), so the sharded
analog is the packed coefficient transport (ops/jpeg.py) split per data
shard — each device receives ONLY its own frames' sparse coefficients over
its own host->device link and runs the expand + MXU IDCT locally under
``shard_map``. No device ever materializes another shard's frames, and the
per-link byte cost stays the single-device ~2-3 bytes/nonzero.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _data_size(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape))["data"]


def _pad_stream(arr: np.ndarray, n: int, fill: int) -> np.ndarray:
    """Pad a packed stream to length ``n`` with the tail-filler convention
    (gap=255 keeps implied positions climbing past the tensor; value 0)."""
    if arr.size == n:
        return arr
    out = np.full(n, fill, arr.dtype)
    out[:arr.size] = arr
    return out


class ShardedPackedFeed:
    """Entropy-decode JPEG batches into per-data-shard packed streams and
    expand them to a mesh-sharded frame array.

    Host side: one :class:`~vision_basedsensor_tpu.ops.jpeg.MjpegBatchDecoder`
    entropy-decodes each shard's contiguous frame slice into its own
    HostPacked payload (frames are independent, so the split is exact).
    Device side: the payload stacks ship with a ``P('data')`` sharding — one
    transfer per device link — and a ``shard_map`` expand runs the
    cumsum + sorted scatter + IDCT locally per shard.

    Output frames carry the mesh's canonical frame sharding (rows also split
    over ``spatial`` when the mesh has that axis), ready for
    ``make_sharded_pipeline``'s step without resharding the batch axis.
    """

    def __init__(self, mesh: Mesh, decoder=None):
        from vision_basedsensor_tpu.ops.jpeg import MjpegBatchDecoder
        self.mesh = mesh
        self._dec = decoder if decoder is not None else MjpegBatchDecoder()
        self._expand_cache: dict = {}

    @property
    def last_stats(self) -> dict | None:
        return self._dec.last_stats

    def decode_packed(self, jpegs: list[bytes]) -> jnp.ndarray:
        """Batch of same-geometry JPEGs -> mesh-sharded (B, H, W) float32.

        ``len(jpegs)`` must divide evenly by the mesh's data axis (callers
        batch at a multiple of it; pad the final short chunk with repeats
        and slice, as shard_frames does for raw frames).
        """
        d = _data_size(self.mesh)
        n = len(jpegs)
        if n % d != 0:
            raise ValueError(f"batch of {n} frames does not divide the data "
                             f"axis ({d}); pad the final chunk")
        per = n // d
        shards = [self._dec.entropy_decode_packed(jpegs[i * per:(i + 1) * per])
                  for i in range(d)]
        geo = {(s.height, s.width, s.grid) for s in shards}
        if len(geo) != 1:
            raise ValueError(f"geometry changed inside a batch: {geo}")
        h, w = shards[0].height, shards[0].width
        grid = shards[0].grid

        # Uniform stream lengths across shards (shard_map blocks must be
        # equal): pad every shard to the max bucket with tail fillers.
        e_cap = max(s.gaps.size for s in shards)
        s_cap = max(s.sgaps.size for s in shards)
        gaps = np.stack([_pad_stream(s.gaps, e_cap, 255) for s in shards])
        vals = np.stack([_pad_stream(s.vals, e_cap, 0) for s in shards])
        sgaps = np.stack([_pad_stream(s.sgaps, s_cap, 255) for s in shards])
        sdeltas = np.stack([_pad_stream(s.sdeltas, s_cap, 0) for s in shards])
        qtables = np.stack([s.qtables for s in shards])  # (d, per, 64)

        data_sh = NamedSharding(self.mesh, P("data"))
        expand = self._expand_for(h, w, grid)
        return expand(jax.device_put(gaps, data_sh),
                      jax.device_put(vals, data_sh),
                      jax.device_put(sgaps, data_sh),
                      jax.device_put(sdeltas, data_sh),
                      jax.device_put(qtables, data_sh))

    def _expand_for(self, h: int, w: int, grid: tuple[int, int]):
        key = (h, w, grid)
        if key not in self._expand_cache:
            from vision_basedsensor_tpu.ops.jpeg import delta_idct_frames
            from vision_basedsensor_tpu.parallel.mesh import _frame_spec

            mesh = self.mesh
            out_spec = _frame_spec(mesh)

            def _local(g, v, sg, sd, q):
                # Local blocks are (1, cap) / (1, per, 64): one shard each.
                frames = delta_idct_frames(g[0], v[0], sg[0], sd[0], q[0],
                                           height=h, width=w, grid=grid)
                if "spatial" in mesh.axis_names:
                    # shard_map out_specs split the LOCAL result; rows are
                    # whole here, so declare P('data') and let the jit-level
                    # constraint below reshard rows once, on device.
                    pass
                return frames

            fn = jax.shard_map(_local, mesh=mesh,
                               in_specs=(P("data"), P("data"), P("data"),
                                         P("data"), P("data")),
                               out_specs=P("data"), check_vma=False)

            @jax.jit
            def expand(g, v, sg, sd, q):
                frames = fn(g, v, sg, sd, q)
                return jax.lax.with_sharding_constraint(
                    frames, NamedSharding(mesh, out_spec))

            self._expand_cache[key] = expand
        return self._expand_cache[key]
