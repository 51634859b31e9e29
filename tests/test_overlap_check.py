"""The profile-based overlap check harness stays runnable (BASELINE
config 5: overlap itself needs >= 2 hosts; this pins the MECHANISM —
free vs serialized variants compile, agree numerically, and report)."""

import os
import subprocess
import sys


def test_overlap_check_harness_runs():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    p = subprocess.run(
        [sys.executable, "scripts/check_overlap_profile.py", "--cpu",
         "--tp", "4", "--d", "256", "--layers", "2", "--iters", "2"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.returncode == 0, p.stderr[-1500:]
    assert "overlap_speedup" in p.stdout, p.stdout
