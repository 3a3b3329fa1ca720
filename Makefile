# Build/automation layer (the reference drives everything through Makefiles,
# Makefile:1-67 and the examples workflow in README.md:70-103).

PY ?= python

.PHONY: all tests test bench native clean serve dryrun parity tpu-test

all: native tests

# unit + integration tests on the virtual 8-device CPU mesh, run as a few
# shorter-lived chunks with one retry on an XLA:CPU runtime crash
# (scripts/run_tests.py); `make test-one FILE=tests/test_x.py` for one file
tests test:
	$(PY) scripts/run_tests.py

test-one:
	$(PY) -m pytest -x -q $(FILE)

# headline benchmark on the available accelerator (one JSON line)
bench:
	$(PY) bench.py

# opt-in real-chip lane: compiles every Pallas kernel through Mosaic on the
# attached TPU and diffs against the XLA path (skips cleanly without a TPU)
tpu-test:
	$(PY) -m pytest tests_tpu/ -x -q -p no:cacheprovider

# black-box REST log-diff against committed goldens (model: reference
# test/Makefile). `make parity UPDATE=--update` regenerates the goldens.
parity:
	$(PY) scripts/parity.py $(UPDATE)

# 16MP-scale parity for the rgb path (VERDICT r3 item 4): same harness,
# 4096px fixtures, separate .s4096 goldens -- catches scale-dependent
# numerics (subsample strides, histogram bins, balance block grids)
parity-big:
	$(PY) scripts/parity.py --size 4096 --jobs rgb_full $(UPDATE)

# build the native C FITS codec explicitly (also built lazily on first use)
native:
	$(PY) -c "from nightlight_tpu.native import fitsio; print('native codec:', 'ok' if fitsio._load() else 'unavailable (numpy fallback)')"
	$(PY) -c "from nightlight_tpu.native import packio; print('native pack:', 'ok' if packio._load() else 'unavailable (numpy fallback)')"

# multi-chip dry run on an 8-device virtual CPU mesh
dryrun:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
	XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_collective_timeout_seconds=120 --xla_cpu_collective_call_warn_stuck_timeout_seconds=60 --xla_cpu_collective_call_terminate_timeout_seconds=120" \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

serve:
	$(PY) -m nightlight_tpu.cli serve

clean:
	rm -f nightlight_tpu/native/_fitsio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
