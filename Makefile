# Build/serve/test targets (the reference Makefile only wraps docker).

PORT ?= 8080

.PHONY: native serve test bench examples clean

native:
	$(MAKE) -C native

serve: native
	python -m raytracer_tpu.server.main scenes --port $(PORT) --http-port 8090

test: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

examples: native
	./render_examples.sh

clean:
	$(MAKE) -C native clean
	rm -rf examples_out
