from dgq_tpu.serving.batch_engine import (  # noqa: F401
    BatchedKVCache,
    engine_decode_batched,
    engine_prefill_slot,
    init_batched_cache,
)
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request  # noqa: F401
