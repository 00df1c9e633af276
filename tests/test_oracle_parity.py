"""Local replica of the driver's t2 gate over every registered query
(SURVEY.md §5.2.2), at sf0.001 for speed. tools/check_parity.py runs
the same comparison at sf0.01 pre-commit."""

import pytest

import data_pipeline_standalone_scripts_spark as engine
from data_pipeline_standalone_scripts_spark.oracle import check_query
from data_pipeline_standalone_scripts_spark.registry import REGISTRY

engine.load_all_operators()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, sf_small):
    rep = check_query(name, spark, sf_small)
    assert rep.ok, str(rep)


def test_registry_contract():
    """Every T2 query has an oracle; T2w/PT never do."""
    for name, q in REGISTRY.items():
        if q.check == "T2":
            assert q.oracle, f"{name} declared T2 without oracle SQL"
        else:
            assert q.oracle is None, f"{name} declared {q.check} but has an oracle"


def test_entry_contract(spark):
    """Driver smoke: entry() returns rows with a stable schema."""
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.schema.simpleString() == "struct<n_name:string,revenue:double>"
    assert len(df.collect()) > 0
    qs, osql = se.queries(), se.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 80
