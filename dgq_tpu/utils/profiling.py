"""Profiling and roofline analysis.

The reference's observability is wall-clock prints and cuda memory summaries
(reference: entry.py:98-100, evalutils.py:25,132).  Here:

  * a trace context around jax.profiler (usable on direct-attached TPUs;
    the axon tunnel build cannot serve the profiler, so it degrades to
    wall-clock),
  * an analytic roofline model for the W4A8 engine: per-token FLOPs and
    bytes from the model dims, the compute/bandwidth bound, and achieved
    fractions given a measured step time — the "per-kernel roofline calc"
    SURVEY §5 asks for.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

V5E_PEAK_INT8 = 394.7e12
V5E_PEAK_BF16 = 197.4e12
V5E_HBM_GBPS = 819e9


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dgq_tpu_trace", enabled: bool = True):
    """jax.profiler trace context with wall-clock fallback."""
    import jax

    t0 = time.perf_counter()
    started = False
    if enabled:
        try:
            jax.profiler.start_trace(log_dir)
            started = True
        except Exception:
            pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        print(f"[trace] wall: {time.perf_counter() - t0:.3f}s"
              + (f", profile in {log_dir}" if started else " (profiler unavailable)"))


@dataclasses.dataclass
class EngineRoofline:
    flops_per_token: float
    weight_bytes: float
    kv_bytes_per_token: float  # at a given context length
    compute_bound_s: float
    bandwidth_bound_s: float

    @property
    def bound(self) -> str:
        return "compute" if self.compute_bound_s > self.bandwidth_bound_s else "bandwidth"

    def achieved(self, step_time_s: float) -> dict:
        floor = max(self.compute_bound_s, self.bandwidth_bound_s)
        return {
            "step_time_s": step_time_s,
            "floor_s": floor,
            "fraction_of_roofline": floor / step_time_s,
            "bound": self.bound,
        }


def engine_decode_roofline(
    cfg,
    batch: int = 1,
    context: int = 1024,
    *,
    peak_int8: float = V5E_PEAK_INT8,
    hbm_gbps: float = V5E_HBM_GBPS,
) -> EngineRoofline:
    """Analytic decode-step roofline for the W4A8 LLaMA engine.

    Weights stream once per step (int4 packed + int8 group scales); the INT8
    KV cache reads `context` tokens per layer; MXU work is the 4 fused GEMMs
    (padded M is excluded — it is overhead, not useful work).
    """
    d, f = cfg.hidden_size, cfg.intermediate_size
    nq = cfg.num_attention_heads * cfg.head_dim
    nkv = cfg.num_key_value_heads * cfg.head_dim
    L = cfg.num_hidden_layers
    v = cfg.vocab_size

    lin_params = L * (d * (nq + 2 * nkv) + nq * d + 2 * d * f + f * d)
    flops = 2 * batch * (lin_params + v * d)  # GEMVs + lm_head
    attn_flops = 2 * batch * L * 2 * nq * context  # qk + pv
    weight_bytes = lin_params / 2 + lin_params / 128  # int4 packed + int8 scales
    weight_bytes += 2 * v * d  # bf16 embed+head (tied storage read once)
    kv_bytes = batch * L * 2 * nkv * context  # int8 K and V

    total_flops = flops + attn_flops
    total_bytes = weight_bytes + kv_bytes
    return EngineRoofline(
        flops_per_token=total_flops,
        weight_bytes=weight_bytes,
        kv_bytes_per_token=kv_bytes,
        compute_bound_s=total_flops / peak_int8,
        bandwidth_bound_s=total_bytes / hbm_gbps,
    )
