from dgq_tpu.utils.evalutils import ppl_eval  # noqa: F401
