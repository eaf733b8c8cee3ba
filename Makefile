# Convenience targets (reference has an equivalent Makefile wrapper).

.PHONY: install test bench native capi clean format format-check

# Format gate (reference CI enforces clang-format; Makefile:48-52 there).
format:
	python scripts/lint.py --fix

format-check:
	python scripts/lint.py

install:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	mkdir -p build && cd build && cmake ../csrc -G Ninja && ninja

# Flat C API shared library for FFI hosts (header: csrc/parakeet.h)
capi:
	python -c "from parakeet_tpu.native import build_capi; p = build_capi(); \
	print(p or exit('capi build failed'))"

clean:
	rm -rf build parakeet_tpu/_native .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
