"""S7 — the JDBC batch-insert sink, exercised END-TO-END against a real
embedded database (Apache Derby ships on Spark's classpath), not a mock.

The reference's Oracle target (src/oracle_target.py:83-123) array-binds
one INSERT per polled batch with an inline NOT-EXISTS dedup on the
configured column set (src/oracle_target.py:97-115; README.md:132-137).
The Spark decomposition is dedup-BEFORE-write (operators/dedup.py
``dedup_against_existing``: dropDuplicates + left-anti against the sink's
keys) followed by a plain JDBC append (sinks/writers.py ``write_jdbc``,
``batchsize`` standing in for executemany's array bind). These tests pin
the composed behaviour the reference guarantees:

  law 4/5 (reference test_integration.py:214-237, 363-410): re-running a
  load writes exactly 0 new rows — the exactly-once backstop;
  within-batch duplicates collapse (the reference's row-by-row
  NOT-EXISTS inside one transaction admits only the first).
"""

from __future__ import annotations

import tempfile

import pytest

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url() -> str:
    tmp = tempfile.mkdtemp(prefix="derby_s7_")
    return f"jdbc:derby:{tmp}/db;create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY)
        .load()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jdbc_write_read_roundtrip(spark, derby_url):
    """write_jdbc lands rows in a real database and they read back
    intact — types and values survive the JDBC boundary."""
    from dvh_airflow_kafka_spark.sinks.writers import write_jdbc

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -0.25)], "k long, v string, x double"
    )
    write_jdbc(df, derby_url, "t_round", options={"driver": DERBY})
    assert _rows(_read(spark, derby_url, "t_round")) == [
        (1, "alpha", 1.5),
        (2, "beta", -0.25),
    ]


def test_jdbc_insert_dedup_cycle_is_exactly_once(spark, derby_url):
    """The full reference insert cycle against a live sink: first load
    collapses within-batch duplicates; a verbatim re-run inserts 0 rows;
    an incremental batch inserts only its genuinely new keys — the
    NOT-EXISTS semantics of src/oracle_target.py:97-115 recomposed as
    anti-join + append."""
    from dvh_airflow_kafka_spark.operators import dedup_against_existing
    from dvh_airflow_kafka_spark.sinks.writers import write_jdbc

    table = "t_dedup"
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "k long, v string"
    )

    # first load: no existing table yet -> only within-batch dedup
    first = dedup_against_existing(batch, None, ["k"])
    write_jdbc(first, derby_url, table, options={"driver": DERBY})
    assert _rows(_read(spark, derby_url, table)) == [(1, "a"), (2, "b"), (3, "c")]

    # law 4/5: replaying the SAME batch against the sink writes 0 rows
    existing = _read(spark, derby_url, table)
    rerun = dedup_against_existing(batch, existing, ["k"])
    assert rerun.count() == 0
    write_jdbc(rerun, derby_url, table, options={"driver": DERBY})
    assert _read(spark, derby_url, table).count() == 3

    # incremental batch: one overlap (suppressed), one new key (inserted)
    nxt = spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string")
    fresh = dedup_against_existing(nxt, _read(spark, derby_url, table), ["k"])
    write_jdbc(fresh, derby_url, table, options={"driver": DERBY})
    assert _rows(_read(spark, derby_url, table)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]


def test_jdbc_dedup_respects_configured_column_set(spark, derby_url):
    """skip-duplicates-with is a COLUMN SET, not the whole row
    (README.md:132-137): a row matching an existing row on the
    configured keys is suppressed even when other columns differ."""
    from dvh_airflow_kafka_spark.operators import dedup_against_existing
    from dvh_airflow_kafka_spark.sinks.writers import write_jdbc

    table = "t_keys"
    write_jdbc(
        spark.createDataFrame([(1, "old")], "k long, v string"),
        derby_url,
        table,
        options={"driver": DERBY},
    )
    batch = spark.createDataFrame([(1, "NEW"), (2, "two")], "k long, v string")
    fresh = dedup_against_existing(
        batch, _read(spark, derby_url, table), ["k"]
    )
    write_jdbc(fresh, derby_url, table, options={"driver": DERBY})
    # k=1 suppressed despite the differing v; the sink keeps the original
    assert _rows(_read(spark, derby_url, table)) == [(1, "old"), (2, "two")]


def test_jdbc_writer_emits_reference_contract_options(spark):
    """Contract pin for option drift: write_jdbc must append (never
    overwrite a sink table), array-bind via ``batchsize`` (default 5000,
    the reference README.md:79-80 recommendation), and pass caller
    options (driver, sessionInitStatement, createTableColumnTypes)
    through verbatim — the whitelisted successor of the reference's
    eval'd type hints (src/base.py:35-42)."""
    import inspect

    from dvh_airflow_kafka_spark.sinks import writers

    src = inspect.getsource(writers.write_jdbc)
    sig = inspect.signature(writers.write_jdbc)
    assert sig.parameters["batchsize"].default == 5000
    assert 'mode("append")' in src  # never truncates the sink
    assert "eval" not in src  # reference's eval'd config is NOT replicated
