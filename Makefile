# Developer entry points (reference Makefile analog: test/format targets)

.PHONY: test test-fast bench dryrun multihost

test:
	python -m pytest tests/ -q

# skip the heaviest integration tests (multi-process multihost, CLI
# subprocess smokes) for a quick signal
test-fast:
	python -m pytest tests/ -q --ignore=tests/test_multihost.py \
	    --ignore=tests/test_scripts.py --ignore=tests/test_hlo_stability.py

bench:
	python bench.py

dryrun:
	python __graft_entry__.py 8

multihost:
	python -m pytest tests/test_multihost.py -q
