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
