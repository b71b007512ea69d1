# One-command local equivalent of .github/workflows/ci.yml.
#
# The workflow file has never executed on a hosted runner (no GitHub is
# reachable from this environment), so this Makefile IS the executable CI:
# `make ci` runs the exact same three jobs — lint, the full test suite on
# the virtual 8-device CPU mesh, and the driver compile-check/dryrun — with
# the same commands and environment the workflow specifies.  A passing run
# is recorded in docs/CI.md.

PY ?= python
MESH_ENV = XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu

.PHONY: ci lint test compile-check

ci: lint test compile-check
	@echo "ci: all three jobs passed"

# The workflow lints with ruff; no lint wheel is baked into this image,
# so fall back to the dependency-free tools/lint.py (same finding
# classes that ruff has caught here: syntax, unused import, redefined
# import) whenever ruff is absent.
lint:
	@if $(PY) -m ruff --version >/dev/null 2>&1; then \
		$(PY) -m ruff check reductive_tpu tests benches; \
	else \
		$(PY) tools/lint.py reductive_tpu tests benches; \
	fi

test:
	$(MESH_ENV) $(PY) -m pytest tests/ -x -q

compile-check:
	$(MESH_ENV) $(PY) -c "\
	import jax; \
	jax.config.update('jax_platforms', 'cpu'); \
	import __graft_entry__ as g; \
	fn, args = g.entry(); \
	jax.jit(fn)(*args); \
	g.dryrun_multichip(8); \
	print('compile check + dryrun ok')"
