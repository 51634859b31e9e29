"""bench.py contract test (VERDICT r1 #1): the driver benchmark must ALWAYS
print exactly one parseable JSON line with the roofline metric — run here on
CPU (DGQ_BENCH_FORCE_CPU, interpret-mode kernels, tiny shapes) end-to-end
including the decode round."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_json_line():
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DGQ_BENCH_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    d = json.loads(lines[0])
    assert d["unit"] == "fraction_of_roofline"
    assert "value" in d and "vs_baseline" in d
    assert d["extra"]["fused_us"] > 0  # tops rounds to 0.0 in interpret mode
    # decode round merged into extras (CPU path: tiny 2-layer engine)
    assert d["extra"]["decode_ms_per_step_7b_b1"] > 0


@pytest.mark.slow
def test_bench_tiny_deadline_still_emits_line():
    """VERDICT r4 #2: a wall-clock budget too small for the extra stages
    must still yield exactly one parseable JSON line (stages are skipped
    with recorded reasons, never hung)."""
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DGQ_BENCH_FORCE_CPU"] = "1"
    env["DGQ_BENCH_DEADLINE_S"] = "1"  # everything after the GEMM round skips
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    d = json.loads(lines[0])
    assert d["unit"] == "fraction_of_roofline"
    # the skipped stages are recorded, not silently absent
    errs = d.get("extra", {}).get("errors", [])
    assert any("skipped (deadline" in e for e in errs), errs


def test_bench_sigterm_emits_best_so_far():
    """The driver's timeout sends SIGTERM: bench must print its best-so-far
    JSON line instead of dying silently (round-4 rc=124 regression)."""
    import signal as _signal
    import time as _time

    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DGQ_BENCH_FORCE_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    _time.sleep(8.0)  # past signal-handler registration, likely mid-round
    proc.send_signal(_signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out
    d = json.loads(lines[0])
    assert d["unit"] == "fraction_of_roofline"
