"""Collective/compute overlap configuration (BASELINE config 5).

On TPU the idiomatic way to overlap the row-parallel all-reduces with the
next layer's INT8 GEMMs is NOT hand-written NCCL-style streams (the
reference has no distributed layer at all, SURVEY §2.3) but XLA's
latency-hiding scheduler: with LHS enabled XLA hoists the psum's
all-reduce-start past independent compute and sinks the all-reduce-done
just before the first use, so the ICI transfer of layer n's o_proj/down
output rides under layer n's remaining GEMMs.

These flags must be set before the first backend initialization.
"""

from __future__ import annotations

import os
import subprocess
import sys

# The historical flag set (jax <= ~0.4 era).  Probed on this stack
# (jax 0.9.0, 2026-08): the XLA_FLAGS parser rejects EVERY one of these —
# async collective fusion and the latency-hiding scheduler graduated from
# flags to default-on behavior, so there is nothing to set.  The list is
# kept as the validated-legacy reference; enable_latency_hiding_scheduler
# probes before committing anything into XLA_FLAGS (an unknown flag is a
# process-fatal parse error at backend init, not a warning).
LATENCY_HIDING_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true "
    "--xla_enable_async_collective_permute=true "
    "--xla_tpu_enable_latency_hiding_scheduler=true"
)

_PROBE = (
    "import os,sys\n"
    "os.environ['JAX_PLATFORMS']='cpu'\n"
    "import jax\n"
    "jax.config.update('jax_platforms','cpu')\n"
    "jax.devices()\n"
    "print('FLAGOK')\n"
)


def _probe_once(flag_str: str) -> bool:
    env = dict(os.environ, XLA_FLAGS=flag_str, JAX_PLATFORMS="cpu")
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                           capture_output=True, text=True, timeout=120)
        return "FLAGOK" in p.stdout
    except Exception:  # noqa: BLE001 — treat probe failure as unsupported
        return False


def supported_overlap_flags(flags: str = LATENCY_HIDING_FLAGS) -> list:
    """Return the subset of ``flags`` this jaxlib's XLA_FLAGS parser
    accepts.  One combined subprocess probe answers the common cases
    (all accepted / all rejected — XLA aborts listing EVERY unknown flag,
    so one rejection in the batch means per-flag bisection is needed only
    for mixed stacks).  Cached per process.

    Caveat (documented limitation): the probe initializes the CPU client,
    whose flag parser is the jaxlib build's.  A PJRT plugin whose
    device-side compiler parses XLA_FLAGS differently is not exercised —
    on such stacks run scripts/check_overlap_flags.py once against the
    real backend before trusting the enable path."""
    cache = getattr(supported_overlap_flags, "_cache", None)
    if cache is not None and cache[0] == flags:
        return cache[1]
    all_flags = flags.split()
    if _probe_once(flags):
        ok = all_flags
    else:
        ok = [f for f in all_flags if _probe_once(f)]
    supported_overlap_flags._cache = (flags, ok)
    return ok


def enable_latency_hiding_scheduler() -> None:
    """Append whichever overlap flags this stack still accepts to
    XLA_FLAGS (call before backend init; idempotent; no-op when — the
    modern case — the scheduler is built-in and no flag exists)."""
    flags = os.environ.get("XLA_FLAGS", "")
    ok = supported_overlap_flags()
    missing = [f for f in ok if f not in flags]
    if missing:
        os.environ["XLA_FLAGS"] = (flags + " " + " ".join(missing)).strip()


def multihost_initialize(coordinator_address: str = None, num_processes: int = None, process_id: int = None):
    """jax.distributed.initialize wrapper for multi-host pods.  With TPU
    metadata available (GKE/QR environments) all arguments are discovered
    automatically."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
