# Engine CI lanes. The unit lane runs at sf0.001 (fast differential
# coverage); the driver grades at sf0.01, so run `make test-driver-scale`
# before any handoff to catch sf-dependent drift (e.g. guards that only
# trigger on larger fixtures) at the graded scale. `make verify` is the
# independent driver simulation (the real correctness gate), `make bench`
# the perf surface vs BASELINE.md.

PY ?= python

.PHONY: test test-driver-scale verify verify-sf01 bench all record

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

all: test test-driver-scale verify verify-sf01 bench

# One-shot per-round evidence recording: make record ROUND=06
# Writes the five committed artifacts (unit-scale pytest log stays in /tmp;
# driver-scale pytest + sweeps at all THREE fixture scales) at the current
# sha. Run AFTER the last code commit of the round so the artifacts
# describe HEAD.
record:
	test -n "$(ROUND)" || (echo "usage: make record ROUND=NN" && false)
	$(PY) -m pytest tests/ -q > /tmp/tes_record_unit.txt 2>&1 || (tail -5 /tmp/tes_record_unit.txt && false)
	tail -1 /tmp/tes_record_unit.txt
	TES_TEST_SF_DIR=/root/testdata/sf0.01 $(PY) -m pytest tests/ -q > PYTEST_DRIVER_SCALE_r$(ROUND).txt 2>&1 || (tail -5 PYTEST_DRIVER_SCALE_r$(ROUND).txt && false)
	tail -1 PYTEST_DRIVER_SCALE_r$(ROUND).txt
	$(PY) .claude/skills/verify/driver_sim.py > CORRECTNESS_FULL_r$(ROUND).txt 2>&1 || (tail -5 CORRECTNESS_FULL_r$(ROUND).txt && false)
	tail -2 CORRECTNESS_FULL_r$(ROUND).txt
	TES_VERIFY_SF_DIR=/root/testdata/sf0.1 $(PY) .claude/skills/verify/driver_sim.py > CORRECTNESS_FULL_SF01_r$(ROUND).txt 2>&1 || (tail -5 CORRECTNESS_FULL_SF01_r$(ROUND).txt && false)
	tail -2 CORRECTNESS_FULL_SF01_r$(ROUND).txt
	TES_VERIFY_SF_DIR=/root/testdata/sf0.001 $(PY) .claude/skills/verify/driver_sim.py > CORRECTNESS_FULL_SF0001_r$(ROUND).txt 2>&1 || (tail -5 CORRECTNESS_FULL_SF0001_r$(ROUND).txt && false)
	tail -2 CORRECTNESS_FULL_SF0001_r$(ROUND).txt
