"""JDBC schema/pk introspection + auto-partitioned reads, exercised
against Apache Derby's embedded in-memory engine (the JDBC database
that ships inside the Spark distribution — same DatabaseMetaData
surface the reference hits on Postgres via information_schema +
pg_index, postgres_source.py:177-236)."""

from __future__ import annotations

import pytest

from ai_etl_framework_spark.sources.readers import (
    _jdbc_connection,
    jdbc_table_info,
    read_jdbc,
)


@pytest.fixture(scope="module")
def derby_url(spark):
    url = "jdbc:derby:memory:introspectdb;create=true"
    conn = _jdbc_connection(spark, url, None, None)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE claims ("
        " claim_id INT NOT NULL,"
        " batch_no SMALLINT,"
        " amount DOUBLE,"
        " approved BOOLEAN,"
        " note VARCHAR(64) DEFAULT 'none',"
        " filed DATE,"
        " created TIMESTAMP,"
        " PRIMARY KEY (claim_id))"
    )
    for i in range(20):
        st.executeUpdate(
            f"INSERT INTO claims VALUES ({i}, {i % 3}, {i * 1.5},"
            f" {'true' if i % 2 else 'false'}, 'n{i}',"
            f" DATE('2024-01-0{i % 9 + 1}'),"
            f" TIMESTAMP('2024-01-01 10:00:0{i % 9}'))"
        )
    st.close()
    conn.close()
    return url


def test_table_info_schema_and_pk(spark, derby_url):
    info = jdbc_table_info(spark, derby_url, "claims")  # lower-case probe
    assert info["name"] == "CLAIMS"  # Derby folds unquoted names upper
    assert info["inferred"] is False
    assert info["primary_key"] == ["CLAIM_ID"]
    by_name = {f["name"]: f for f in info["fields"]}
    assert [f["name"] for f in info["fields"]] == [
        "CLAIM_ID", "BATCH_NO", "AMOUNT", "APPROVED", "NOTE", "FILED", "CREATED",
    ], "fields must come back in ordinal position order"
    assert by_name["CLAIM_ID"]["type"] == "integer"
    assert by_name["BATCH_NO"]["type"] == "integer"
    assert by_name["AMOUNT"]["type"] == "float"
    assert by_name["APPROVED"]["type"] == "boolean"
    assert by_name["NOTE"]["type"] == "string"
    assert by_name["FILED"]["type"] == "date"
    assert by_name["CREATED"]["type"] == "datetime"
    assert by_name["CLAIM_ID"]["nullable"] is False
    assert by_name["AMOUNT"]["nullable"] is True
    assert "none" in (by_name["NOTE"]["default"] or "")


def test_table_info_missing_table_raises(spark, derby_url):
    with pytest.raises(ValueError, match="not found"):
        jdbc_table_info(spark, derby_url, "no_such_table")


def test_read_jdbc_auto_partitioned_on_pk(spark, derby_url):
    """partition_column='auto' resolves to the integer pk and derives
    min/max bounds with one scalar query — a 4-task parallel ingest
    with nothing but the URL and table name."""
    df = read_jdbc(
        spark, derby_url, table="CLAIMS",
        partition_column="auto", num_partitions=4,
    )
    assert df.count() == 20
    assert df.rdd.getNumPartitions() == 4
    assert set(df.columns) == {
        "CLAIM_ID", "BATCH_NO", "AMOUNT", "APPROVED", "NOTE", "FILED", "CREATED",
    }
    # partitioned and unpartitioned reads agree
    plain = read_jdbc(spark, derby_url, table="CLAIMS")
    assert sorted(r["CLAIM_ID"] for r in df.collect()) == sorted(
        r["CLAIM_ID"] for r in plain.collect()
    )


def test_read_jdbc_explicit_partition_bounds_autofill(spark, derby_url):
    df = read_jdbc(
        spark, derby_url, table="CLAIMS",
        partition_column="CLAIM_ID", num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 20


def test_read_jdbc_query_mode(spark, derby_url):
    df = read_jdbc(
        spark, derby_url,
        query="SELECT claim_id, amount FROM claims WHERE amount > 10",
    )
    assert df.count() == sum(1 for i in range(20) if i * 1.5 > 10)


def test_auto_partition_requires_integer_pk(spark):
    url = "jdbc:derby:memory:nopkdb;create=true"
    conn = _jdbc_connection(spark, url, None, None)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE logs (msg VARCHAR(10))")
    st.executeUpdate("INSERT INTO logs VALUES ('x')")
    st.close()
    conn.close()
    with pytest.raises(ValueError, match="no integer"):
        read_jdbc(spark, url, table="logs", partition_column="auto")
