# Developer entry points (CI mirrors these — .github/workflows/ci.yml)

.PHONY: test test-fast test-full bench-cpu native

# quick signal: kernel interpret suite + block-shape/packing logic (~4 min)
test-fast:
	python -m pytest tests/test_kernels.py tests/test_attention.py \
	  tests/test_fused_decode.py tests/test_autotune.py \
	  tests/test_packing.py tests/test_quantizer.py -q

test: test-fast

# everything (CPU, virtual 8-device mesh; ~9 min)
test-full:
	python -m pytest tests/ -q

# bench must always emit one JSON line, even without a TPU
bench-cpu:
	DGQ_BENCH_FORCE_CPU=1 python bench.py

# host-side C components (built lazily on import; this forces it)
native:
	python -c "from dgq_tpu.native import get_codec; assert get_codec() is not None, 'codec build failed'"
