"""Full-decode-step A/B for EngineConfig.quant_pv on real hardware.

The kernel-level parts probe (probe_quant_pv_parts.py) shows the int8
p @ V decode attention beats fp p @ V once the exp-weight quantization is
the constant-scale trunc(x+0.5) rule (paired median 0.71x fp).  This
script measures what that does to a FULL decode step: a few-layer
7B-shaped engine, cache filled to ~Smax so attention carries real weight,
all steps inside one on-device lax.scan, legs alternated round-robin so
tunnel window drift hits both equally.

Run: python scripts/ab_quant_pv_step.py [layers] [batch] [cycles]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.models.engine import (  # noqa: E402
    EngineConfig,
    engine_forward,
    init_kv_cache,
)
from dgq_tpu.models.llama import LlamaConfig  # noqa: E402
from dgq_tpu.models.synthetic import build_llama_engine  # noqa: E402

LAYERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CYCLES = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SMAX = 2048
STEPS = 32


def main():
    cfg = LlamaConfig(num_hidden_layers=LAYERS)
    eng = build_llama_engine(cfg)
    cache0 = init_kv_cache(cfg, BATCH, SMAX, num_layers=LAYERS)
    # timing depends only on cache.length (zeros attend like real tokens);
    # start near-full so the attention legs see ~Smax-length contexts
    cache0 = cache0._replace(length=jnp.int32(SMAX - STEPS - 1))
    tok0 = jnp.zeros((BATCH, 1), jnp.int32)

    fns = {}
    for name, qpv in (("fp", False), ("quant_pv", True)):
        ecfg = EngineConfig(cfg=cfg, use_kernel=True, quant_pv=qpv)

        @jax.jit
        def multi(e, tok, cache, ecfg=ecfg):
            def body(carry, _):
                t, c = carry
                lg, c = engine_forward(ecfg, e, t, c)
                return (jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32), c), None

            (tf, cf), _ = jax.lax.scan(body, (tok, cache), None, length=STEPS)
            return tf

        t0 = time.perf_counter()
        jax.device_get(multi(eng, tok0, cache0))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        fns[name] = multi

    res = {n: [] for n in fns}
    for _ in range(CYCLES):
        for name, f in fns.items():
            t0 = time.perf_counter()
            jax.device_get(f(eng, tok0, cache0))
            res[name].append((time.perf_counter() - t0) / STEPS * 1e3)
    for name, ts in res.items():
        print(f"{name:9s}: best {min(ts):6.3f} ms/step  "
              f"[{', '.join(f'{x:6.3f}' for x in ts)}]", flush=True)
    ratios = sorted(res["quant_pv"][i] / res["fp"][i] for i in range(CYCLES))
    print(f"paired quant_pv/fp: median {ratios[len(ratios)//2]:5.3f}  "
          f"[{', '.join(f'{x:4.2f}' for x in ratios)}]", flush=True)


if __name__ == "__main__":
    main()
