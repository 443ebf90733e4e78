# Build/serve/test targets (the reference Makefile only wraps docker).

PORT ?= 8080

.PHONY: native serve test test-all bench examples clean

native:
	$(MAKE) -C native

serve: native
	python -m raytracer_tpu.server.main scenes --port $(PORT) --http-port 8090

# Fast tier: excludes the compile-heavy tests (tests/conftest.py
# SLOW_TEST_FILES).  ~4 min cold on a 1-core container with the persistent
# test compile cache; seconds-to-a-minute warm.
test: native
	python -m pytest tests/ -x -q -m "not slow"

# Everything, including mesh/interpret/statistical tests: ~25-45 min cold
# on a 1-core container, a few minutes warm (compile cache).
test-all: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

examples: native
	./render_examples.sh

clean:
	$(MAKE) -C native clean
	rm -rf examples_out
