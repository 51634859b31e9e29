"""Generate dgq_tpu/ops/autotune_defaults.json — the in-tree block-shape
cache for the LLaMA-family engine GEMM shapes (VERDICT r1 #5 / ROADMAP #11).

Entries come from the measured rules (scripts/sweep_gemm.py: fat-M prefill
winner (2048, 512, bk=256); round-1 decode sweeps: fat bn/bk GEMV tiles) as
encoded in ops/autotune.heuristic_blocks, evaluated once per shape here so
get_blocks resolves every flagship shape from the file without re-deriving.
Re-run after re-sweeping.  Keys are device-tagged for the TPU v5e this repo
benches on.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgq_tpu.ops.autotune import heuristic_blocks

DEVICE = "TPU_v5_lite"
GROUPSIZE = 128

# (hidden, intermediate-padded, n_q, n_kv) per LLaMA size; pad_to=2048 MLP
# padding as from_ptq applies (11008->11264 etc.)
FAMS = {
    "7b": dict(h=4096, f=11264, nq=4096, nkv=4096),
    "13b": dict(h=5120, f=14336, nq=5120, nkv=5120),
    "30b": dict(h=6656, f=17920, nq=6656, nkv=6656),  # 17920 % 256 == 0
    "65b": dict(h=8192, f=22528, nq=8192, nkv=8192),
}


def gemm_shapes(h, f, nq, nkv):
    """Engine GEMMs: fused qkv, o, fused gate_up, down."""
    return [
        (nq + 2 * nkv, h),  # qkv_proj  (N, K)
        (h, nq),            # o_proj
        (2 * f, h),         # gate_up_proj
        (h, f),             # down_proj
    ]


def main():
    out = {}
    for fam, d in FAMS.items():
        for n, k in gemm_shapes(d["h"], d["f"], d["nq"], d["nkv"]):
            for bucket_m, bm_hint in ((1, 128), (2048, 256)):  # decode, prefill
                bm, bn, bk = heuristic_blocks(bucket_m, n, k, 2 * GROUPSIZE, bm_hint=bm_hint)
                mb = "d" if bucket_m <= 32 else "2048"
                out[f"{DEVICE}:{mb}:{n}x{k}g{GROUPSIZE}"] = [bm, bn, bk]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "dgq_tpu", "ops", "autotune_defaults.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} entries to {path}")


if __name__ == "__main__":
    main()
