"""Multi-chip sharding on the virtual 8-device CPU mesh: results must match
the single-device pipeline exactly and actually shard."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_basedsensor_tpu.config import PipelineConfig, ReconstructConfig
from vision_basedsensor_tpu.parallel import (
    make_mesh,
    make_sharded_pipeline,
    shard_frames,
)
from vision_basedsensor_tpu.pipeline import initialize, process_frames
from vision_basedsensor_tpu.synth import default_scene, render_frames


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(reconstruct=ReconstructConfig(warmup_frames=0))
    scene = default_scene(height=240, width=320)
    d = jnp.zeros((8, 65, 3), jnp.float32)
    d = d.at[:, :, 2].add(-0.1 * jnp.arange(8)[:, None])
    frames = render_frames(scene, d)
    ref = initialize(frames[0], cfg)
    return cfg, scene, frames, ref


def test_setup_actually_detects(setup):
    """Guard against vacuously-passing comparisons: the small scene must
    produce real detections."""
    cfg, scene, frames, ref = setup
    assert int(np.asarray(ref.valid).sum()) >= 60


def test_data_parallel_matches_single_device(setup):
    cfg, scene, frames, ref = setup
    mesh = make_mesh(jax.devices()[:8])
    step = make_sharded_pipeline(mesh, scene.cam, cfg)
    out = step(shard_frames(frames, mesh), jax.device_put(ref))

    base = process_frames(frames, ref, scene.cam, cfg)
    np.testing.assert_allclose(np.asarray(out.recon.world),
                               np.asarray(base.recon.world), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.recon.seen),
                                  np.asarray(base.recon.seen))
    np.testing.assert_allclose(np.asarray(out.recon.cum_path),
                               np.asarray(base.recon.cum_path), atol=1e-4)


def test_data_parallel_output_is_sharded(setup):
    cfg, scene, frames, ref = setup
    mesh = make_mesh(jax.devices()[:8])
    step = make_sharded_pipeline(mesh, scene.cam, cfg)
    out = step(shard_frames(frames, mesh), jax.device_put(ref))
    # Detections stay sharded over the data axis; scan outputs are replicated.
    assert len(out.detections.xy.sharding.device_set) == 8


def test_2d_mesh_data_spatial(setup):
    cfg, scene, frames, ref = setup
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    assert mesh.axis_names == ("data", "spatial")
    step = make_sharded_pipeline(mesh, scene.cam, cfg)
    out = step(shard_frames(frames, mesh), jax.device_put(ref))
    base = process_frames(frames, ref, scene.cam, cfg)
    np.testing.assert_allclose(np.asarray(out.recon.world),
                               np.asarray(base.recon.world), atol=1e-4)


def test_graft_entry_dryrun():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
