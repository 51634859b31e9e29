"""Quantization observability: SNR metrics and per-layer reporting.

The reference prints a texttable of per-layer weight error / input SNRs for
the GPTQ path (reference: dgq/quant/quantizer_helper.py:68-93) and implements
torch_snr_error (reference: dgq/utils/modelutils.py:114-161).  Here the same
signals are first-class: pure jnp snr, a QuantReport accumulated during
calibration, and structured (JSON-able) emission instead of print-only
(SURVEY §5 "structured logging + metrics from day 1").
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


def snr_error(y_pred: jax.Array, y_real: jax.Array, reduction: str = "mean") -> jax.Array:
    """Signal-to-noise power ratio of the error: ||y_pred - y_real||^2 /
    ||y_real||^2, per first-dim sample (reference: modelutils.py:114-161).

    Lower is better; 0 means identical.
    """
    yp = y_pred.astype(jnp.float32).reshape(y_pred.shape[0], -1)
    yr = y_real.astype(jnp.float32).reshape(y_real.shape[0], -1)
    noise = jnp.sum((yp - yr) ** 2, axis=1)
    signal = jnp.sum(yr**2, axis=1)
    ratio = noise / jnp.maximum(signal, 1e-20)
    if reduction == "mean":
        return jnp.mean(ratio)
    if reduction == "sum":
        return jnp.sum(ratio)
    return ratio


@dataclasses.dataclass
class LinearQuantRecord:
    layer: int
    name: str
    weight_error: float  # GPTQ loss or weight MSE
    weight_snr: float  # ||w_q - w||^2 / ||w||^2
    output_snr: Optional[float]  # layer-output SNR on calib inp1
    amax: Optional[float]
    time_s: float

    def row(self) -> str:
        osnr = "-" if self.output_snr is None else f"{self.output_snr:.3e}"
        amax = "-" if self.amax is None else f"{self.amax:.3f}"
        return (
            f"L{self.layer:<3d} {self.name:<16s} werr={self.weight_error:.4e} "
            f"wSNR={self.weight_snr:.3e} outSNR={osnr} amax={amax} "
            f"t={self.time_s:.2f}s"
        )


@dataclasses.dataclass
class QuantReport:
    records: List[LinearQuantRecord] = dataclasses.field(default_factory=list)

    def add(self, rec: LinearQuantRecord, verbose: bool = True):
        self.records.append(rec)
        if verbose:
            print("[quant] " + rec.row())

    def to_json(self) -> str:
        return json.dumps([dataclasses.asdict(r) for r in self.records], indent=1)

    def summary(self) -> Dict[str, float]:
        if not self.records:
            return {}
        import numpy as np

        return {
            "mean_weight_snr": float(np.mean([r.weight_snr for r in self.records])),
            "max_weight_snr": float(np.max([r.weight_snr for r in self.records])),
            "mean_output_snr": float(
                np.mean([r.output_snr for r in self.records if r.output_snr is not None] or [0])
            ),
            "total_time_s": float(np.sum([r.time_s for r in self.records])),
            "n_linears": len(self.records),
        }


def weight_quant_metrics(w_fp: jax.Array, w_q: jax.Array, inp1: Optional[jax.Array] = None):
    """(weight_snr, output_snr) for a quantized linear."""
    wsnr = float(snr_error(w_q[None], w_fp[None]))
    osnr = None
    if inp1 is not None:
        y_fp = inp1 @ w_fp.T
        y_q = inp1 @ w_q.T
        osnr = float(snr_error(y_q[None], y_fp[None]))
    return wsnr, osnr
