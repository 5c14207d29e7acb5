.PHONY: test bench native dryrun clean

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-parity:
	python -m pytest tests/ -q -m parity

test-full:
	python -m pytest tests/ -q -m "parity or not parity"

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
