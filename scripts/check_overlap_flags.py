"""Flags-accepted check for parallel/overlap.LATENCY_HIDING_FLAGS.

Sets the latency-hiding scheduler flags BEFORE backend init, then compiles
and runs a jitted matmul on whatever accelerator is attached.  Passing
means the current jax/libtpu stack parses the flags and compiles under
them (it does NOT measure overlap — that needs a multi-chip profile).
Referenced by tests/test_multihost.py's docstring; run manually on TPU.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child():
    sys.path.insert(0, REPO)
    from dgq_tpu.parallel.overlap import enable_latency_hiding_scheduler

    enable_latency_hiding_scheduler()  # must precede backend init
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    print("backend:", jax.default_backend(), "device:", jax.devices()[0].device_kind)
    print("result[0,0]:", float(y[0, 0]))
    print("FLAGS ACCEPTED")


def main():
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        capture_output=True, text=True, timeout=420,
    )
    sys.stdout.write(proc.stdout)
    if "FLAGS ACCEPTED" in proc.stdout:
        print("OK: latency-hiding flags parsed and compiled against this backend")
        return 0
    sys.stderr.write(proc.stderr[-2000:])
    print("FAIL: flags rejected or compile failed", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(main())
