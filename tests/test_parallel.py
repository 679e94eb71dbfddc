"""Mesh/sharding helpers: placement, host slicing, replicated state."""

import numpy as np
import jax
import jax.numpy as jnp

from dusty_gan_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    local_batch_slice,
    replicated,
    shard_batch,
)


class TestMesh:
    def test_create_mesh_all_devices(self):
        mesh = create_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8
        assert mesh.axis_names == (DATA_AXIS,)

    def test_create_mesh_subset(self):
        mesh = create_mesh(4)
        assert mesh.devices.size == 4

    def test_shard_batch_places_leading_axis(self):
        mesh = create_mesh(8)
        batch = {"x": jnp.arange(16.0).reshape(16, 1)}
        sharded = shard_batch(mesh, batch)
        shards = sharded["x"].addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape == (2, 1) for s in shards)
        np.testing.assert_array_equal(np.asarray(sharded["x"]), np.asarray(batch["x"]))

    def test_replicated_state(self):
        mesh = create_mesh(8)
        x = jax.device_put(jnp.ones((4, 4)), replicated(mesh))
        assert all(s.data.shape == (4, 4) for s in x.addressable_shards)

    def test_local_batch_slice_partitions(self):
        slices = [local_batch_slice(32, pi, 4) for pi in range(4)]
        seen = []
        for s in slices:
            seen.extend(range(s.start, s.stop))
        assert seen == list(range(32))


class TestDryrunHermetic:
    def test_dryrun_multichip_under_hostile_env(self, monkeypatch):
        """The driver invokes dryrun_multichip from a shell exporting
        JAX_PLATFORMS=axon (a real remote-TPU plugin that cannot host an
        8-device mesh); round 1 failed exactly here (MULTICHIP_r01.json
        rc=1). The entry point must scrub/force its own backend env."""
        import __graft_entry__ as ge

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        monkeypatch.setenv("TPU_SKIP_MDS_QUERY", "1")
        ge.dryrun_multichip(4)  # raises on subprocess failure
