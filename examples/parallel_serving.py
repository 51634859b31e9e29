"""Every parallelism axis on one (virtual) mesh: tp, pp, dp, sp.

Runs offline on CPU with 8 virtual devices in a couple of minutes:

    python examples/parallel_serving.py

Demonstrates that the SAME quantized model serves identically under
  * tensor parallelism        (ContinuousBatcher(mesh=...), heads sharded)
  * pipeline parallelism      (fns=pp_serving_fns, layers sharded)
  * data-parallel replicas    (BatcherServer([...]), request routing)
  * sequence parallelism      (sp_engine_prefill, ring attention)
— greedy tokens are placement-independent by construction.

On real hardware drop the CPU pinning and size the mesh to the pod slice;
'tp' rides ICI, 'pp' crosses DCN, dp replicas scale with hosts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

if not os.environ.get("DGQ_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.utils.datautils import synthetic_stream


def main():
    # -- quantize once (W4A8 g128, dual-grained, INT8 KV) -------------------
    cfg = tiny_llama_config(hidden_size=512, intermediate_size=1024,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 64).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(),
                       wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompts = [np.asarray(p, np.int32)
               for p in ([3, 5, 3, 5], [7, 7, 2, 7], [1, 2, 3, 4])]

    def serve(batcher):
        for i, p in enumerate(prompts):
            batcher.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        return {r.uid: r.output_ids for r in batcher.run()}

    # -- dense reference ----------------------------------------------------
    want = serve(ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                                   prefill_pad=16))
    print("dense        :", want)

    # -- tensor parallelism (heads over 2 chips; K/tp must stay a multiple
    # of the 256-row packed span — hidden 512 allows tp=2) ------------------
    from dgq_tpu.parallel.mesh import make_mesh

    got = serve(ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                                  prefill_pad=16, mesh=make_mesh(dp=1, tp=2)))
    assert got == want
    print("tp=2         :", "identical")

    # -- pipeline parallelism (layers over 2 stages x tp=2) -----------------
    from dgq_tpu.parallel.pipeline import make_pp_mesh, pp_shard_engine_params
    from dgq_tpu.parallel.pp_serving import pp_serving_fns

    pmesh = make_pp_mesh(pp=2, tp=2)
    got = serve(ContinuousBatcher(ecfg, pp_shard_engine_params(eng, pmesh),
                                  fns=pp_serving_fns(pmesh), num_slots=2,
                                  max_len=64, prefill_pad=16))
    assert got == want
    print("pp=2 x tp=2  :", "identical")

    # -- data-parallel replicas behind one server ---------------------------
    import json
    import socket

    from dgq_tpu.serving.server import BatcherServer

    def mk(devs):
        return ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                                 prefill_pad=16,
                                 mesh=make_mesh(dp=1, tp=2, devices=devs))

    devices = jax.devices()
    with BatcherServer([mk(devices[:2]), mk(devices[2:4])]) as srv:
        with socket.create_connection((srv.host, srv.port), timeout=120) as s:
            f = s.makefile("r")
            for p in prompts:
                s.sendall((json.dumps({"prompt_ids": [int(t) for t in p],
                                       "max_new_tokens": 5}) + "\n").encode())
            got = {}
            for _ in prompts:
                m = json.loads(f.readline())
                got[m["uid"]] = m["output_ids"]
            metrics = srv.metrics()
    assert got == want
    print("dp=2 replicas:", "identical;",
          [m["requests_finished"] for m in metrics["replicas"]],
          "requests per replica")

    # -- sequence parallelism (ring-attention long-context prefill) ---------
    from dgq_tpu.parallel.sequence import make_sp_mesh, sp_engine_prefill

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 32)), jnp.int32)
    ref, _ = engine_forward(ecfg, eng, ids, init_kv_cache(cfg, 1, 32))
    logits, cache = sp_engine_prefill(ecfg, eng, ids, make_sp_mesh(4))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    print("sp=4 ring    : logits allclose, INT8 KV sharded over 'sp'")
    print("OK")
    # Hard-exit: everything above already flushed + asserted.  CPython
    # finalization with live meshes + the CPU client's thread pools can
    # abort inside XLA teardown on some jaxlib builds (observed here:
    # "terminate called after throwing an instance of ''" AFTER the OK) —
    # skip the C++ destructor lottery; the demo's exit code should reflect
    # the demo's assertions, not runtime teardown races.
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
