# Reference parity: the upstream repo drove its suite through make
# (SURVEY.md §2.1 build row). Same entry points here.

PY ?= python

.PHONY: test test-all test-slow test-tpu bench bench-all dryrun example lint

# Fast gate: everything except the property-fuzz / brute-force-oracle
# sweeps (marked `slow`). Full coverage: `make test-all`, or the two halves
# in parallel CI jobs (`make test` + `make test-slow`).
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-slow:
	$(PY) -m pytest tests/ -q -m slow

test-all:
	$(PY) -m pytest tests/ -q

test-tpu:
	TPUBQ_TEST_TPU=1 $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

bench-all:
	$(PY) bench.py --all

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# PYTHONPATH=.: `python examples/x.py` puts examples/ (not the repo root)
# on sys.path, so the package would not resolve without it
example:
	PYTHONPATH=. $(PY) examples/active_sampling.py --steps 3
	PYTHONPATH=. $(PY) examples/active_sampling_2d.py --steps 4
	PYTHONPATH=. $(PY) examples/fleet_serving.py --problems 4 --steps 2

lint:
	$(PY) -m compileall -q tpubq tests examples bench.py __graft_entry__.py
