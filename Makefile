# Convenience targets (role parity with the reference's code/Makefile).

PY ?= python

.PHONY: test test-fast bench synth train-fast mise clean-cache

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_e2e.py --ignore=tests/test_fitting.py

bench:
	$(PY) bench.py

synth:
	$(PY) -m hold_tpu.data.synthetic --out ./data/toy --frames 12

train-fast: synth
	$(PY) -m hold_tpu.train --case toy -f --num_epoch 1 --tempo_len 20

mise:
	g++ -O3 -shared -fPIC -std=c++17 hold_tpu/meshing/csrc/mise.cpp -o hold_tpu/meshing/csrc/libmise.so

clean-cache:
	rm -rf .jax_cache
