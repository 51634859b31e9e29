from dgq_tpu.models.llama import (  # noqa: F401
    LlamaConfig,
    init_llama_params,
    llama_apply,
    llama_block,
    tiny_llama_config,
)
