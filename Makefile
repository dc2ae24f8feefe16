# Developer targets (reference had a cookiecutter Makefile with lint/sync
# targets, Makefile:34-50; these are the equivalents for this framework).

PY ?= python

.PHONY: test test-fast lint bench native clean

# Retries once on the known XLA:CPU oversubscription abort (see the script).
test:
	PY=$(PY) bash scripts/run_tests.sh

test-fast:
	$(PY) -m pytest tests/ -x -q -k "not Trainer and not e2e"

lint:
	$(PY) -m py_compile $$(git ls-files '*.py')
	@echo "compile-lint OK"

bench:
	$(PY) bench.py

native: faster_rcnn_tpu/native/_image_loader.so

faster_rcnn_tpu/native/_image_loader.so: faster_rcnn_tpu/native/image_loader.cpp
	g++ -O3 -march=native -shared -fPIC $< -o $@ -ljpeg

clean:
	rm -f faster_rcnn_tpu/native/_image_loader.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
