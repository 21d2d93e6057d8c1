from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = (
        SparkSession.builder.master("local[*]")
        .appName("blazegraph-spark-tests")
        # local[*] = 32 task threads here: the 1g driver-heap default is
        # marginal for a long shared session (observed heap OOM in the
        # RDR writer roundtrip mid-suite) — size like session.get_spark
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.ansi.enabled", "false")  # match session.get_spark
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def tiny_store(spark):
    """Hand-built RDF fixture for algebra edge cases."""
    from blazegraph_database_spark.model.store import TripleStore

    rows = [
        ("a", "knows", "b", "iri"),
        ("b", "knows", "c", "iri"),
        ("c", "knows", "d", "iri"),
        ("a", "name", "Alice", "string"),
        ("b", "name", "Bob", "string"),
        ("c", "name", "Carol", "string"),
        ("a", "age", "30", "long"),
        ("b", "age", "25", "long"),
        ("d", "name", "Dave", "string"),
        ("e", "name", "Eve", "string"),
        ("x", "likes", "y", "iri"),
        ("y", "likes", "x", "iri"),
    ]
    return TripleStore(spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string"))


@pytest.fixture(scope="session")
def sf_store(spark):
    from blazegraph_database_spark.sources.relational import cached_store

    return cached_store(spark, SF_DIR)
