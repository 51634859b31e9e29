from dgq_tpu.quant.quantizer import (  # noqa: F401
    QuantParams,
    affine_quantize,
    affine_quantize_values,
    find_params,
)
from dgq_tpu.quant.packing import (  # noqa: F401
    PackedLinear,
    pack_nibbles,
    unpack_nibbles,
    pack_linear,
    pack_linear_w4w8,
    dequantize_linear,
)
from dgq_tpu.quant.act_quant import (  # noqa: F401
    quantize_activation_static,
    quantize_activation_per_tensor_absmax,
    quantize_activation_per_token_absmax,
    quantize_activation_per_tensor_asym,
    make_act_quant_fn,
)
