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

LATENCY_HIDING_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true "
    "--xla_enable_async_collective_permute=true "
    "--xla_tpu_enable_latency_hiding_scheduler=true"
)


def enable_latency_hiding_scheduler() -> None:
    """Append the overlap flags to XLA_FLAGS (call before importing/using
    jax devices; no-op if already present)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "latency_hiding_scheduler" in flags:
        return
    os.environ["XLA_FLAGS"] = (flags + " " + LATENCY_HIDING_FLAGS).strip()


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
