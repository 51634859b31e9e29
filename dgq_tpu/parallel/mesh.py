"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.3: literal "cuda:0",
CPU-offload instead of sharding).  Here scaling is mesh-native from the
start: a (dp, tp) mesh within a slice (ICI), optionally extended with a
leading dcn axis across slices (hybrid mesh), per the standard JAX scaling
recipe (mesh axes ordered so the fastest-varying axis rides ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (dp, tp) mesh over the given (default: all) devices.

    tp defaults to n_devices // dp.  tp is the innermost axis so tensor-
    parallel collectives ride the fastest interconnect dimension.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp <= n, f"dp({dp}) * tp({tp}) > devices({n})"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_hybrid_mesh(dcn: int, dp: int, tp: int) -> Mesh:
    """Multi-slice mesh: leading dcn axis over slices, (dp, tp) within a
    slice over ICI.  Requires jax.distributed to be initialized across
    hosts.

    Falls back to grouping devices by process index when slice metadata is
    unavailable (CPU fake-cluster testing, single-slice debug) — the dcn
    axis then means "process boundary", which is the right DCN analogue for
    the 2-process smoke test (tests/test_multihost.py)."""
    from jax.experimental import mesh_utils

    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp, tp),
            dcn_mesh_shape=(dcn, 1),
        )
        return Mesh(arr.reshape(dcn, dp, tp), ("dcn", "dp", "tp"))
    except Exception:
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        if len(devs) < dcn * dp * tp:
            raise
        arr = np.asarray(devs[: dcn * dp * tp]).reshape(dcn, dp, tp)
        return Mesh(arr, ("dcn", "dp", "tp"))
