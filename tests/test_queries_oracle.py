"""Driver-contract gate, reproduced locally: every queries() entry runs and
every oracle_sql() entry matches DuckDB exactly at sf0.001."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_match_oracles(spark):
    from anycrawl_spark.queries import verify_against_duckdb

    failures = verify_against_duckdb(spark, SF_DIR)
    assert not failures, failures


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    assert set(oq) <= set(qs)
    assert len(qs) >= 30
