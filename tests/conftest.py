from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"

# Long parity/property sweeps (>= ~10 s each in the r12 full-suite
# durations report) — marked `slow` and excluded by the default run
# (pytest.ini addopts) so the suite fits the driver's pytest budget.
# Substring match on the nodeid; parametrized families are matched by
# their fixture-id prefixes. The default suite keeps at least one
# representative of every family (e.g. the fast TestGeoSpatialDefaults
# manifest fixtures stay in).
SLOW_TESTS = (
    # sparql parser / path-machinery parity sweeps
    "test_geared_reach_parity_all_shapes",
    "test_anchored_seq_path_geared",
    "test_anchored_path_seeded_expansion",
    "test_chained_exact_arithmetic",
    "test_frontier_walk_batches_empty_checks",
    "test_seeded_closure_deep_chain_no_truncation",
    "test_geared_nested_closure_no_allpairs",
    "test_bounded_zero_lower_const_endpoint_parity",
    # geospatial brute-force parity
    "test_knn_equals_bruteforce_and_expands_bands",
    # truth-maintenance recompute-parity sweeps
    "test_counting_strategy_store",
    "test_data_delete_never_recomputes_closure",
    "test_delete_with_closure_matches_full_recompute",
    "test_counting_reinsert_no_phantom_support",
    # RTO fixture sweeps
    "test_rto_bar_q1",
    "test_rto_lubm_queries",
    # property-based randomized sweeps
    "test_writers_roundtrip_property",
    "test_id_join_path_equals_lexical_path",
    "test_fuzzy_decontaminate_matches_bruteforce",
    "test_tc_retract_equals_recompute_random",
    "test_native_typed_path_equals_lexical_random",
    # reference geo manifest families (the slow configurations; the
    # TestGeoSpatialDefaults family minus defaults05 stays in)
    "TestGeoSpatialServiceConfigurationCustomDatatype",
    "TestGeoSpatialCustomSerializerWKT",
    "TestGeoSpatialDefaults:geo-defaults05",
    # REST / blueprints end-to-end (server startup per test)
    "test_property_graph_client_over_rest",
    "test_remote_service_federation_over_http",
    "test_bnode_bindings_serialize_as_bnodes",
    "test_rest_transactions",
    "test_tsv_types_object_iris",
    "test_delete_by_query",
    # federation / service transport sweeps
    "test_federation[service14.rq",
    "test_service_variable_endpoint_deep_and_inner_binding",
    "test_bd_values_service",
    "test_service_clause_remote_transport",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


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
