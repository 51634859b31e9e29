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


def test_overlap_hlo_schedule_parser():
    """The scheduled-HLO analyzer (scripts/check_overlap_hlo.py) counts
    independent compute between async start/done pairs correctly — pinned
    on a canned schedule fragment shaped like real v5e output (shape
    strings contain parens, e.g. T(8,128))."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from check_overlap_hlo import analyze_schedule

    hlo = """HloModule m, is_scheduled=true

%body (p: s8[2]) -> s8[2] {
  %cp-start = (s8[2,16]{1,0:T(8,128)}, u32[]) collective-permute-start(%copy.1), channel_id=1
  %f1 = f32[2,16]{1,0:T(8,128)} fusion(%a, %b), kind=kLoop
  %gte = f32[] get-tuple-element(%t), index=0
  %f2 = f32[2,16]{1,0:T(2,128)} fusion(%f1), kind=kOutput
  %d1 = f32[2,2]{1,0} dot(%f1, %f2), lhs_contracting_dims={1}
  %cp-done = s8[2,16]{1,0:T(8,128)} collective-permute-done(%cp-start)
  %f3 = f32[2,16] fusion(%cp-done), kind=kLoop
}
"""
    pairs = analyze_schedule(hlo, "collective-permute-start",
                             "collective-permute-done")
    assert len(pairs) == 1
    assert pairs[0]["n_between"] == 3  # f1, f2, d1 — NOT gte, NOT f3
    # empty overlap is reported as such
    hlo2 = hlo.replace("%f1 = ", "%skip = f32[] add(%a, %b)\n  %f1x = ").replace(
        "fusion(%a, %b), kind=kLoop\n", "")
    pairs2 = analyze_schedule(
        hlo2.replace("%f2 = f32[2,16]{1,0:T(2,128)} fusion(%f1), kind=kOutput\n  ", "")
            .replace("%d1 = f32[2,2]{1,0} dot(%f1, %f2), lhs_contracting_dims={1}\n  ", ""),
        "collective-permute-start", "collective-permute-done")
    assert pairs2 and pairs2[0]["n_between"] == 0
