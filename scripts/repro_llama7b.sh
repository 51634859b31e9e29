#!/usr/bin/env bash
# Unattended LLaMA-7B accuracy-gate reproduction (BASELINE config 1+2).
#
# Mirrors the reference's llama7b.sh flow (reference: llama7b.sh:2-5):
#   1. DGQ quantization (search + w4w8 + smoothquant + kvquant, W4A8 g128)
#      with fake-quant WikiText-2 ppl eval,
#   2. reload the saved checkpoint, convert to the real-quant INT8 engine
#      (--inference_mod), WikiText-2 ppl through the engine,
#   3. gate: engine ppl <= BASELINE.json published dgq_a8w4_g128 + 0.1.
#
# Weights are not present in this environment; run the moment they are:
#   bash scripts/repro_llama7b.sh /path/to/llama-7b-hf [outdir]
#
# Calibration runs on CPU by default (tunnel-TPU calibration is
# compile-bound; see dgq_tpu memory notes) — set DGQ_REPRO_TPU=1 to run
# everything on the TPU backend.

set -euo pipefail

MODEL_DIR="${1:?usage: repro_llama7b.sh /path/to/llama-7b-hf [outdir]}"
OUT_DIR="${2:-/tmp/dgq_llama7b_w4a8}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

PLATFORM_ARGS=()
if [ "${DGQ_REPRO_TPU:-0}" != "1" ]; then
  export JAX_PLATFORMS=cpu
fi

echo "== step 1: quantize (search + w4w8 + smooth + kv) + fake-quant ppl =="
python -m dgq_tpu.entry "$MODEL_DIR" wikitext2 \
  --wt_fun search --groupsize 128 --wbits 4 --abits 8 \
  --smoothquant --w4w8 --kvquant \
  --save_safetensors "$OUT_DIR" \
  --eval | tee /tmp/dgq_repro_step1.log

echo "== step 2: reload + engine conversion + engine ppl =="
python -m dgq_tpu.entry "$MODEL_DIR" wikitext2 \
  --wt_fun search --groupsize 128 --wbits 4 --abits 8 \
  --smoothquant --w4w8 --kvquant \
  --load "$OUT_DIR" --inference_mod \
  --eval | tee /tmp/dgq_repro_step2.log

echo "== step 3: gate vs published numbers =="
python - "$REPO" <<'EOF'
import json, re, sys

repo = sys.argv[1]
pub = json.load(open(f"{repo}/BASELINE.json"))["published"]
tab = pub["wikitext2_ppl_seqlen2048"]
target = tab["dgq_a8w4_g128"]["llama-7b"]
# provenance caveat travels WITH the gate (VERDICT r2 #7): these constants
# were transcribed from builder knowledge without network access — a pass
# against an approx target is evidence, not proof, until re-verified
if tab.get("dgq_a8w4_g128_approx"):
    print("WARNING: gate target 'dgq_a8w4_g128' is flagged approx "
          "(transcribed from builder knowledge, never re-verified against "
          "the paper). Provenance:", pub.get("provenance", "(none)"))

def last_ppl(path):
    txt = open(path).read()
    hits = re.findall(r"ppl[^=]*=\s*([0-9]+\.[0-9]+)", txt)
    return float(hits[-1]) if hits else None

fake = last_ppl("/tmp/dgq_repro_step1.log")
engine = last_ppl("/tmp/dgq_repro_step2.log")
print(f"fake-quant ppl: {fake}   engine ppl: {engine}   published+0.1 gate: {target + 0.1}")
assert fake is not None and engine is not None, "ppl not found in logs"
assert abs(fake - engine) < 0.05, f"fake-quant vs engine ppl diverge: {fake} vs {engine}"
assert engine <= target + 0.1, f"GATE FAIL: engine ppl {engine} > {target + 0.1}"
print("ACCURACY GATE PASS" + (" (vs APPROX target — re-verify BASELINE.json)" if tab.get("dgq_a8w4_g128_approx") else ""))
EOF
