.PHONY: test parity parity-driver-scale bench smoke

test:            ## full suite (oracle parity + streaming + golden + plan-shape)
	python -m pytest tests/ -q

parity:          ## oracle parity at smoke scale (fast)
	python -m pytest tests/test_parity.py -q

parity-driver-scale:  ## oracle parity at the driver's sf0.01 gate scale
	SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/test_parity.py -q

bench:           ## headline bench (one JSON line; sf from SPARK_GRAFT_SF_DIR)
	python bench.py

smoke:           ## driver-contract smoke: entry() on a plain session
	python -c "from pyspark.sql import SparkSession; \
	s = SparkSession.builder.master('local[8]').config('spark.ui.enabled','false').getOrCreate(); \
	import __spark_entry__ as e; print(len(e.entry(s).collect()), 'rows')"

audit:           ## data-quality battery on $SPARK_GRAFT_SF_DIR (or sf0.1)
	python jobs/run_audit.py --input $${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}

catalog:         ## regenerate docs/operators.md from the registry
	python -m kube_etl_spark.catalog_doc
