"""End-to-end demo: quantize a tiny LLaMA, convert to the INT8 engine,
save the engine checkpoint, and serve requests with continuous batching.

Runs offline on CPU in ~1 minute:

    python examples/serve_tiny.py

Swap ``tiny_llama_config``/``init_llama_params`` for
``models.hf_loader.load_llama_config/params`` to serve a real checkpoint
(see examples/quantize_llama7b.sh for the CLI route).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU (the demo is tiny); set DGQ_EXAMPLE_TPU=1 to run on the device.
# NB: the env var alone does not override an installed TPU plugin — the
# config update below is the authoritative pin.
import jax

if not os.environ.get("DGQ_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import from_ptq
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving import ContinuousBatcher, Request
from dgq_tpu.serving.sampling import SamplingParams
from dgq_tpu.utils.checkpoint import save_engine
from dgq_tpu.utils.datautils import synthetic_stream


def main():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))

    print("calibrating (W4A8 g128, smoothquant+kvquant)...")
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 64).reshape(2, 64))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    eng = from_ptq(res.params, res.kv_scales, cfg)
    save_engine("/tmp/tiny_engine.safetensors", eng, cfg)
    print("engine checkpoint saved -> /tmp/tiny_engine.safetensors")

    batcher = ContinuousBatcher.from_checkpoint(
        "/tmp/tiny_engine.safetensors", num_slots=2, max_len=64, prefill_pad=16)

    rng = np.random.default_rng(0)
    reqs = [
        Request(uid=0, prompt_ids=rng.integers(0, cfg.vocab_size, 6).astype(np.int32),
                max_new_tokens=8),  # greedy
        Request(uid=1, prompt_ids=rng.integers(0, cfg.vocab_size, 4).astype(np.int32),
                max_new_tokens=8,
                sampling=SamplingParams(temperature=0.8, top_k=40)),
        Request(uid=2, prompt_ids=rng.integers(0, cfg.vocab_size, 9).astype(np.int32),
                max_new_tokens=8, sampling=SamplingParams(top_p=0.9)),
    ]
    for r in reqs:
        batcher.add_request(r)
    for r in batcher.run():
        print(f"request {r.uid}: {r.output_ids}")

    # -- round-2 serving features ------------------------------------------
    # speculative decoding (greedy slots draft via prompt lookup; accepted
    # tokens are ~free on the feed-bound decode step) + prefix caching
    # (the shared "system prompt" is prefilled exactly once)
    spec = ContinuousBatcher.from_checkpoint(
        "/tmp/tiny_engine.safetensors", num_slots=2, max_len=64,
        prefill_pad=16, spec_k=3)
    system_prompt = [9, 4, 2, 7]
    spec.register_prefix(system_prompt)
    for uid, tail in enumerate(([3, 5, 3, 5], [7, 7, 2])):
        spec.add_request(Request(uid=10 + uid,
                                 prompt_ids=np.asarray(system_prompt + tail, np.int32),
                                 max_new_tokens=10))
    for r in spec.run():
        print(f"request {r.uid} (spec+prefix): {r.output_ids}")
    print(f"serving metrics: {spec.metrics()}")
    print(f"prefix hits: {spec.prefix_hits}")

    # -- paged KV serving -----------------------------------------------------
    # memory scales with tokens in flight (pool of 128-token pages, here 8);
    # prefixes share pool pages across slots instead of copying
    from dgq_tpu.serving.paged import PagedBatcher

    paged = PagedBatcher.from_checkpoint(
        "/tmp/tiny_engine.safetensors", num_slots=4, max_len=64,
        page_size=8, num_pages=24, decode_steps=2)
    paged.register_prefix(system_prompt)
    for uid, tail in enumerate(([3, 5, 3, 5], [7, 7, 2], [1, 2, 3])):
        paged.add_request(Request(uid=20 + uid,
                                  prompt_ids=np.asarray(system_prompt + tail, np.int32),
                                  max_new_tokens=8))
    for r in paged.run():
        print(f"request {r.uid} (paged): {r.output_ids}")
    m = paged.metrics()
    print(f"paged metrics: pages={m['pages_in_use']}/{m['pages_total']} "
          f"prefix_hits={m['prefix_hits']} preemptions={m['preemptions']}")


if __name__ == "__main__":
    main()
