# Common targets. Tests run on a virtual 8-device CPU mesh (tests/conftest.py).

test:
	python -m pytest tests/ -q

# Populate the read-only test compile cache (see tests/conftest.py): one
# pytest process per test file with persistent-cache writes enabled, so an
# XLA:CPU serialize segfault loses only that file's entries, never the lane.
warm-test-cache:
	@for f in tests/test_*.py; do \
	  echo "== $$f"; \
	  VQATTACK_TESTS_CACHE_WRITE=1 python -m pytest "$$f" -q || echo "   (non-zero rc tolerated while warming)"; \
	done

test-fast:
	python -m pytest tests/test_pgd.py tests/test_text.py tests/test_models_basic.py -q

bench:
	python bench.py

bench-bf16:
	BENCH_DTYPE=bfloat16 python bench.py

dryrun-multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')"

.PHONY: test test-fast bench bench-bf16 dryrun-multichip

bench-vlmo:
	BENCH_MODEL=vlmo python bench.py

bench-matrix:
	BENCH_MATRIX=1 python bench.py

.PHONY: bench-vlmo bench-matrix
