"""Multi-host distribution layer: hybrid mesh construction, cross-host
gate batching, and host-axis fusion on the virtual 8-device mesh
(2 simulated hosts x 4 chips)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from fhe_tpu.parallel import distributed as dist
from fhe_tpu.parallel import batch as pbatch, collective
from fhe_tpu.tfhe import context, lwe


def _fmesh(num_hosts=2, ici=1):
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    return dist.make_fhe_mesh(ici_parallel=ici, num_hosts=num_hosts)


class TestMesh:
    def test_shapes(self):
        fm = _fmesh(num_hosts=2, ici=2)
        assert dict(fm.mesh.shape) == {"host": 2, "chip_batch": 2, "ici": 2}
        fm1 = _fmesh(num_hosts=4, ici=1)
        assert dict(fm1.mesh.shape) == {"host": 4, "chip_batch": 2, "ici": 1}

    def test_bad_split_raises(self):
        if len(jax.devices()) < 8:
            pytest.skip("need 8 devices")
        with pytest.raises(ValueError, match="divide"):
            dist.make_fhe_mesh(ici_parallel=3, num_hosts=2)

    def test_init_single_process_noop(self):
        assert dist.init_processes() == 1


class TestCrossHostGates:
    def test_gate_batch_over_hybrid_mesh(self):
        """AND truth table, batch sharded over host x chip_batch with the
        key replicated -- results identical to unsharded eval."""
        fm = _fmesh(num_hosts=2, ici=1)
        rng = np.random.default_rng(11)
        ctx = context.BinFheContext.generate("TOY")
        sk = ctx.key_gen(rng)
        key = ctx.bt_key_gen(sk, rng)

        bits_a = np.array([0, 1, 0, 1, 1, 0, 1, 0], dtype=np.int32)
        bits_b = np.array([0, 0, 1, 1, 0, 1, 1, 0], dtype=np.int32)
        ca = ctx.encrypt(sk, bits_a, rng)
        cb = ctx.encrypt(sk, bits_b, rng)
        ref = np.asarray(ctx.decrypt(sk, ctx.eval_bin_gate(key, "AND", ca, cb)))

        key_r, (ca_s, cb_s) = dist.shard_gate_batch(fm, key, (ca, cb))
        out = ctx.eval_bin_gate(key_r, "AND", ca_s, cb_s)
        got = np.asarray(ctx.decrypt(sk, out))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, bits_a & bits_b)

    def test_batch_mesh_flattening(self):
        fm = _fmesh(num_hosts=2, ici=2)
        m = dist.as_batch_mesh(fm)
        assert m.shape["batch"] == 8
        # host-major order preserved: first half of shards on host 0 devices
        host0 = set(d.id for d in fm.mesh.devices[0].reshape(-1))
        first = set(d.id for d in m.devices[:4])
        assert first == host0


class TestHostFusion:
    def test_fusion_axis_is_host(self):
        fm = _fmesh(num_hosts=2, ici=1)
        mesh, axis = dist.fusion_psum_spec(fm)
        assert axis == "host" and axis in mesh.shape
