#!/bin/bash
# End-to-end W4A8 quantization + eval of LLaMA-2-7B — the reference
# llama7b.sh workflow (reference: llama7b.sh:1-5) on dgq_tpu.
set -e
MODEL=${1:-/path/to/Llama-2-7b-hf}
CKPT=${2:-llama7b-w4a8-g128.safetensors}

# 1) calibrate + quantize + save (search quantizer, dual-grained w4w8,
#    smoothing, INT8 KV calibration)
python -m dgq_tpu.entry "$MODEL" wikitext2 \
  --wt_fun search --act_fun static --wbits 4 --abits 8 --groupsize 128 \
  --w4w8 --smoothquant --kvquant --nsamples 32 \
  --save_safetensors "$CKPT"

# 2) load + fake-quant perplexity eval (wikitext2/ptb/c4)
python -m dgq_tpu.entry "$MODEL" wikitext2 --load "$CKPT" --eval

# 3) load + convert to the real-quant INT8 engine + eval
python -m dgq_tpu.entry "$MODEL" wikitext2 --load "$CKPT" --inference_mod --eval
