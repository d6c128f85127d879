.DEFAULT_GOAL := test
SHELL := /bin/bash
SF_DIR ?= /root/testdata/sf0.1

.PHONY: test parity parity-sf1 bench digest image

test:
	python -m pytest tests/ -x -q

# all-oracle Spark-vs-DuckDB hash parity; stamps PARITY_SWEEP.json
# (the pre-commit hook and pytest refuse operator edits over a stale
# stamp — see tools/parity_stamp.py)
parity:
	python regress.py --parity --all --budget 120

parity-sf1:
	python regress.py --parity --all --sf-dir .testdata/sf1 --budget 150

bench:
	python bench.py | python regress.py -

digest:
	python -m kinesis_to_firehose_spark.plans.digest

image:
	docker build -t kinesis-to-firehose-spark .
