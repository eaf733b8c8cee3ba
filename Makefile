# Convenience targets (reference has an equivalent Makefile wrapper).

.PHONY: install test test-nightly bench native capi clean format format-check acceptance

# Format gate (reference CI enforces clang-format; Makefile:48-52 there).
format:
	python scripts/lint.py --fix

format-check:
	python scripts/lint.py

install:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

# Full profile incl. @pytest.mark.slow training/parallelism tests (~35 min)
test-nightly:
	python -m pytest tests/ -q -m "slow or not slow"

bench:
	python bench.py

# Real-weight acceptance-gate rehearsal: fabricate a pseudo-real checkpoint,
# convert -> load -> transcribe -> stage dumps vs torch oracle -> WER gate.
# Passes today with the fabricated checkpoint; passes unchanged the day real
# weights land (point --weights/--vocab/--clip at them). Mirrors reference
# tests/test_all.cpp:878-937 + scripts/compare_encoder.py.
acceptance:
	python scripts/acceptance.py

native:
	mkdir -p build && cd build && cmake ../csrc -G Ninja && ninja

# Flat C API shared library for FFI hosts (header: csrc/parakeet.h)
capi:
	python -c "from parakeet_tpu.native import build_capi; p = build_capi(); \
	print(p or exit('capi build failed'))"

clean:
	rm -rf build parakeet_tpu/_native .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
