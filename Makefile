# azoom developer entry points

.PHONY: test test-full test-slow bench

test:        ## fast tier (default pytest profile, < 5 min)
	python -m pytest tests/ -q

test-full:   ## FULL suite, one command, per-file process isolation
	python scripts/run_full_suite.py

test-slow:   ## slow tier only, per-file isolation
	python scripts/run_full_suite.py -m slow

bench:       ## one-line JSON throughput benchmark (real backend)
	python bench.py
