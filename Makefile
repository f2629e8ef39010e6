# lz4_tpu build/test shell — analog of the reference's Makefile targets
# (reference Makefile:60-117: test, sanitize-style soak, bench, examples).
# Everything runs from the repo root; no install step is required
# (pyproject.toml provides `pip install -e .` packaging).

PY ?= python
PYTEST ?= $(PY) -m pytest

.PHONY: all test slowtest soak bench fullbench examples multichip clean

all: test

# CI suite: CPU interpret + 8-device virtual mesh (tests/conftest.py)
test:
	$(PYTEST) tests/ -x -q

# widened envelopes (big blocks, long streams) — reference `make test` tier
slowtest:
	LZ4TPU_SLOW_TESTS=1 $(PYTEST) tests/ -x -q

# fuzz soak: ≥10k cycles across block/frame/SG/kernel suites
# (reference programs/Makefile:65 time-boxed fuzzer runs)
soak:
	LZ4TPU_FUZZ_CYCLES=10000 LZ4TPU_FUZZ_SEEDS=12 \
	  $(PYTEST) tests/test_fuzz.py -x -q

# headline benchmark (one JSON line; real chip when available)
bench:
	$(PY) bench.py

# per-entry-point table (reference programs/fullbench.c analog)
fullbench:
	$(PY) fullbench.py

examples:
	$(PYTEST) tests/test_examples.py -x -q

# compile-and-run the multi-chip training-step dryrun on a virtual mesh
multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')"

clean:
	rm -rf build dist *.egg-info lz4_tpu/__pycache__ tests/__pycache__
