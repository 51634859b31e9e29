"""2-process CPU jax.distributed smoke (VERDICT r1 #7): the multi-host
code path — jax.distributed.initialize, make_hybrid_mesh over process
boundaries, cross-process psum, and a sharded engine forward — executed on
a fake 2-host cluster.  Also sanity-checks the overlap flag string format
(flag *acceptance* needs the TPU backend: scripts/check_overlap_flags.py)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}\n{out[-3000:]}"
        assert f"MULTIHOST_WORKER_OK pid={i}" in out, out[-3000:]


def test_overlap_flag_probe_mechanism():
    """The subprocess probe must accept a flag every jaxlib knows and
    reject one that no jaxlib knows — validating the mechanism that keeps
    enable_latency_hiding_scheduler from committing a process-fatal flag."""
    from dgq_tpu.parallel.overlap import supported_overlap_flags

    ok = supported_overlap_flags(
        "--xla_force_host_platform_device_count=2 --xla_no_such_flag_ever=1"
    )
    assert ok == ["--xla_force_host_platform_device_count=2"]


def test_overlap_flags_wellformed():
    from dgq_tpu.parallel.overlap import LATENCY_HIDING_FLAGS

    flags = LATENCY_HIDING_FLAGS.split()
    assert len(flags) >= 5
    for f in flags:
        assert f.startswith("--xla_") and "=" in f, f
    # idempotent append (appends only probed-supported flags — possibly
    # none on stacks where the scheduler is built-in)
    from dgq_tpu.parallel import overlap

    saved = os.environ.pop("XLA_FLAGS", None)
    try:
        overlap.enable_latency_hiding_scheduler()
        once = os.environ.get("XLA_FLAGS", "")
        overlap.enable_latency_hiding_scheduler()
        assert os.environ.get("XLA_FLAGS", "") == once
        for f in once.split():
            assert f.startswith("--xla_")
    finally:
        os.environ.pop("XLA_FLAGS", None)
        if saved is not None:
            os.environ["XLA_FLAGS"] = saved
