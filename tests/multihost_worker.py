"""Worker process for the 2-process CPU jax.distributed smoke test
(tests/test_multihost.py — BASELINE config 5's code path on a fake
cluster).  Each process exposes 4 CPU devices; together they form an
8-device cluster with a (dcn=2, dp=1, tp=4) hybrid mesh whose dcn axis is
the process boundary.

Run directly only via the pytest driver (it wires the coordinator env).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dgq_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(dcn=nproc, dp=1, tp=4)
    assert mesh.axis_names == ("dcn", "dp", "tp")

    # cross-process collective over the dcn axis + intra-process over tp
    def allsum(x):
        return jax.lax.psum(jax.lax.psum(x, "tp"), "dcn")

    fn = jax.shard_map(
        allsum, mesh=mesh,
        in_specs=P("dcn", "tp"), out_specs=P("dcn", "tp"),
        check_vma=False,
    )
    x = jnp.ones((nproc * 2, 4 * 2), jnp.float32)
    got = fn(x)
    # psum over both axes sums the 2x4 = 8 shard-local ones -> 8 everywhere
    np.testing.assert_allclose(
        np.asarray(jax.device_get(got.addressable_shards[0].data)), 8.0
    )

    # one sharded engine forward on the hybrid mesh (tp collectives inside)
    from __graft_entry__ import _build_engine, _small_cfg
    from dgq_tpu.models.engine import EngineConfig, init_kv_cache
    from dgq_tpu.parallel.sharded_engine import (
        shard_engine_params,
        shard_kv_cache,
        sharded_engine_forward,
    )

    cfg = _small_cfg(tp=4)
    eng = _build_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    eng_sh = shard_engine_params(eng, mesh)
    cache = shard_kv_cache(init_kv_cache(cfg, 2, 16), mesh)
    ids = jnp.zeros((2, 8), jnp.int32)
    logits, cache = sharded_engine_forward(ecfg, eng_sh, ids, cache, mesh)
    assert logits.shape == (2, 8, cfg.vocab_size)
    local = np.asarray(jax.device_get(logits.addressable_shards[0].data))
    assert np.isfinite(local).all()

    # pipeline parallelism with one stage PER PROCESS: the 'pp' axis spans
    # the process boundary (the intended DCN placement — each inter-stage
    # hop moves one microbatch activation), 'tp' stays intra-process
    from dgq_tpu.parallel.pipeline import (
        make_pp_mesh,
        pp_engine_forward,
        pp_shard_engine_params,
        pp_shard_kv_cache,
    )

    pmesh = make_pp_mesh(nproc, 4)  # jax.devices() is process-major, so
    #                                 pp rank == process id
    eng_pp = pp_shard_engine_params(eng, pmesh)
    pcache = pp_shard_kv_cache(init_kv_cache(cfg, 2, 16), pmesh)
    plogits, pcache = pp_engine_forward(ecfg, eng_pp, ids, pcache, pmesh)
    assert plogits.shape == (2, 8, cfg.vocab_size)
    assert int(pcache.length) == 8
    for sh in plogits.addressable_shards:
        assert np.isfinite(np.asarray(jax.device_get(sh.data))).all()

    print(f"MULTIHOST_WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
