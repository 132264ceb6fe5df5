# Engine CI lanes. The unit lane runs at sf0.001 (fast differential
# coverage); the driver grades at sf0.01, so run `make test-driver-scale`
# before any handoff to catch sf-dependent drift (e.g. guards that only
# trigger on larger fixtures) at the graded scale. `make verify` is the
# independent driver simulation (the real correctness gate), `make bench`
# the perf surface vs BASELINE.md.

PY ?= python

.PHONY: test test-driver-scale verify verify-sf01 bench all

test:
	$(PY) -m pytest tests/ -q

test-driver-scale:
	TES_TEST_SF_DIR=/root/testdata/sf0.01 $(PY) -m pytest tests/ -q

verify:
	$(PY) .claude/skills/verify/driver_sim.py

verify-sf01:
	TES_VERIFY_SF_DIR=/root/testdata/sf0.1 $(PY) .claude/skills/verify/driver_sim.py

bench:
	$(PY) bench.py

all: test test-driver-scale verify bench
