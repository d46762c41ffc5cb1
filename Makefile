# Development orchestration (counterpart of the reference Makefile's
# bazel-test / lint tiers, minus bazel: this is a pure-Python + single
# C++-translation-unit build).

PYTHON ?= python

.PHONY: test test-fast native bench lint clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not bipedal and not box2d and not registry"

native:
	g++ -O2 -std=c++17 -shared -fPIC envpool_tpu/native/sokoban_native.cpp \
	  -o envpool_tpu/native/libsokoban.so

bench:
	$(PYTHON) bench.py

lint:
	$(PYTHON) -m compileall -q envpool_tpu tests examples benchmark tools
	$(PYTHON) tools/lint.py

clean:
	rm -f envpool_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
