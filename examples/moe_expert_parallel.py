"""Expert-parallel Mixtral: quantize a sparse-MoE model and run it with
its experts sharded over an 'ep' mesh axis (parallel/moe.py).

Runs offline on CPU with 8 virtual devices in ~2 minutes:

    python examples/moe_expert_parallel.py

Pipeline: random tiny Mixtral -> the same dual-grained W4A8 PTQ as the
dense families (routing-invariant smoothing; one requant point per MoE
block) -> INT8 engine -> (dp=2, ep=4) mesh, each device holding E/ep whole
experts, one psum per block combine.  Greedy tokens are placement-
independent: the sharded engine reproduces the single-device engine.

On real hardware drop the CPU pinning and size the mesh to the pod slice;
'ep' rides ICI (the combine psum is the only expert collective).
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
from dgq_tpu.models.mixtral import init_mixtral_params, tiny_mixtral_config
from dgq_tpu.models.mixtral_engine import (
    MixtralEngineConfig,
    from_ptq_mixtral,
    init_mixtral_kv_cache,
    mixtral_engine_forward,
)
from dgq_tpu.parallel.moe import (
    ep_mixtral_forward,
    make_ep_mesh,
    shard_moe_engine_params,
    shard_moe_kv_cache,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


def main():
    cfg = tiny_mixtral_config(hidden_size=256, intermediate_size=512,
                              num_attention_heads=4, num_key_value_heads=2)
    params = init_mixtral_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(act_quant=ActQuantConfig(),
                       wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)
    print(f"[moe-ep] calibrating {cfg.num_local_experts}-expert Mixtral ...")
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)
    eng = from_ptq_mixtral(res.params, res.kv_scales, cfg)

    dp, ep = 2, 4
    mesh = make_ep_mesh(ep=ep, dp=dp)
    print(f"[moe-ep] mesh {dict(mesh.shape)}: {cfg.num_local_experts // ep} "
          f"expert(s) per device on 'ep'")
    ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=False)
    eng_sh = shard_moe_engine_params(eng, mesh)

    batch = 2 * dp
    ids = jnp.asarray(
        synthetic_stream(cfg.vocab_size, batch * 16, seed=5).reshape(batch, 16))
    cache = shard_moe_kv_cache(init_mixtral_kv_cache(cfg, batch, 48), mesh)
    logits, cache = ep_mixtral_forward(ecfg, eng_sh, ids, cache, mesh)

    # greedy decode 6 tokens on the mesh, and the same on one device
    toks_ep, toks_1 = [], []
    nxt = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
    for _ in range(6):
        toks_ep.append(np.asarray(nxt)[:, 0].tolist())
        logits, cache = ep_mixtral_forward(ecfg, eng_sh, nxt, cache, mesh)
        nxt = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)

    dcache = init_mixtral_kv_cache(cfg, batch, 48)
    dlogits, dcache = mixtral_engine_forward(ecfg, eng, ids, dcache)
    nxt = jnp.argmax(dlogits[:, -1:, :], -1).astype(jnp.int32)
    for _ in range(6):
        toks_1.append(np.asarray(nxt)[:, 0].tolist())
        dlogits, dcache = mixtral_engine_forward(ecfg, eng, nxt, dcache)
        nxt = jnp.argmax(dlogits[:, -1:, :], -1).astype(jnp.int32)

    assert toks_ep == toks_1, (toks_ep, toks_1)
    print(f"[moe-ep] greedy tokens identical on (dp={dp}, ep={ep}) vs one "
          f"device: {toks_ep[0]} ...")
    print("[moe-ep] OK")


if __name__ == "__main__":
    main()
