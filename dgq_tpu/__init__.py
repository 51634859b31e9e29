"""dgq_tpu — TPU-native dual-grained W4A8 quantization framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the DGQ
reference (ilur98/DGQ): post-training W4A8 quantization of decoder-only LLMs
(LLaMA/LLaMA-2, OPT, BLOOM) with

  * 4-bit per-group asymmetric weights whose FP group scale is factored into
    an INT8 per-group scale times a per-output-channel FP scale (the
    "dual-grained" trick) so the hot GEMM is pure INT8 MXU work,
  * 8-bit static per-tensor activations,
  * INT8 KV-cache quantization calibrated post-RoPE,
  * SmoothQuant-style smoothing folded into adjacent norm/linear weights,
  * layer-sequential calibration (stats -> smooth -> search/GPTQ -> requantized
    re-forward feeding the next block),
  * a fake-quant accuracy path and a real-quant INT8-dataflow engine whose hot
    ops are Pallas TPU kernels (fused INT4->INT8 dequant GEMM, INT8-KV flash
    attention).

Everything is functional: models are pytrees of arrays plus pure apply
functions; quantization passes are params -> params' transforms; sharding is
GSPMD NamedSharding over a jax Mesh.
"""

__version__ = "0.1.0"

from dgq_tpu.config import QuantConfig, ActQuantConfig, WtQuantConfig  # noqa: F401
