from dgq_tpu.parallel.mesh import make_mesh  # noqa: F401
from dgq_tpu.parallel.moe import (  # noqa: F401
    ep_mixtral_forward,
    make_ep_mesh,
    shard_moe_engine_params,
)
from dgq_tpu.parallel.sharded_engine import (  # noqa: F401
    shard_engine_params,
    sharded_engine_forward,
)
