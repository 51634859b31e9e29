from dgq_tpu.ops.quant_matmul import (  # noqa: F401
    w4a8_matmul,
    w4a8_matmul_xla,
    quantize_static_int8,
)
