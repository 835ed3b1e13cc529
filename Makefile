# Common tasks. See CLAUDE.md for environment gotchas.

PY ?= python

.PHONY: test test-slow bench nifio entry dryrun clean

test:
	$(PY) -m pytest tests/ -q

test-slow:
	NIF_SLOW=1 $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

nifio:
	g++ -O3 -march=native -shared -fPIC -pthread \
	    nif_tpu/data/_nifio.cpp -o nif_tpu/data/libnifio.so

entry:
	$(PY) __graft_entry__.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PY) -c \
	  "import jax; jax.config.update('jax_platforms','cpu'); \
	   import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -rf nif_tpu/**/__pycache__ tests/__pycache__ .pytest_cache \
	       nif_tpu/data/libnifio.so
