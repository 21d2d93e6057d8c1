"""Geospatial operator tests: known distances, pruning-vs-brute equivalence,
Z-order key properties (modeled on the reference's geospatial test suite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazegraph_database_spark.operators import geospatial as G


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (1, 0.0, 0.0),
        (2, 0.0, 1.0),      # ~111.2 km east of 1
        (3, 52.5, 13.4),    # Berlin-ish
        (4, 48.9, 2.4),     # Paris-ish (~880 km from Berlin)
        (5, -33.9, 151.2),  # Sydney-ish
        (6, 89.9, 0.0),     # near north pole
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_haversine_known_distances(spark):
    df = spark.range(1).select(
        F.round(G.haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)), 1).alias("deg1"),
        F.round(G.haversine_km(F.lit(52.5), F.lit(13.4), F.lit(48.9), F.lit(2.4)), 0).alias("bp"),
    )
    r = df.first()
    assert abs(r["deg1"] - 111.2) < 0.1
    assert 850 <= r["bp"] <= 910


def test_in_rectangle_matches_brute(points):
    pruned = G.in_rectangle(points, -40.0, 55.0, -10.0, 20.0)
    brute = points.filter(
        (F.col("lat") >= -40) & (F.col("lat") <= 55) & (F.col("lon") >= -10) & (F.col("lon") <= 20)
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(r["id"] for r in brute.collect()) == [1, 2, 3, 4]


def test_in_circle(points):
    out = {r["id"]: r["distance_km"] for r in G.in_circle(points, 0.0, 0.0, 200.0).collect()}
    assert set(out) == {1, 2}
    assert out[1] == 0.0 and abs(out[2] - 111.2) < 0.1


def test_in_circle_crosses_cells(points):
    # radius spanning multiple 10-degree cells still finds everything
    out = {r["id"] for r in G.in_circle(points, 50.0, 8.0, 1000.0).collect()}
    assert out == {3, 4}


def test_zorder_key_deterministic_and_local(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.01, 0.01), (80.0, 170.0)], "lat double, lon double"
    ).select("lat", "lon", G.zorder_key(F.col("lat"), F.col("lon")).alias("z"))
    rows = df.collect()
    zs = [r["z"] for r in rows]
    assert len(set(zs)) >= 2  # far point differs
    assert all(0 <= z < (1 << 32) for z in zs)
    # neighbors' keys are closer than the far point's key
    assert abs(zs[0] - zs[1]) < abs(zs[0] - zs[2])


def test_candidate_cells_cover_box():
    cells = G.candidate_cells(-5.0, 5.0, -5.0, 5.0)
    assert len(cells) == 4  # 2x2 cells at 10-degree grid


def test_geo_datatype_registry_roundtrip(spark):
    from blazegraph_database_spark.operators import geospatial as geo
    from pyspark.sql import functions as F

    dt = geo.get_geo_datatype("geo:lat-lon-time")
    df = spark.createDataFrame(
        [("12.5#45.25#1704067200",), ("-33.9#151.2#1706659200",)], "lit string"
    )
    parsed = df.select(*geo.parse_geo_literal(F.col("lit"), dt))
    rows = sorted(tuple(r) for r in parsed.collect())
    assert rows == [(-33.9, 151.2, 1706659200.0), (12.5, 45.25, 1704067200.0)]
    # serializer round-trip
    back = parsed.select(geo.geo_literal([F.col("lat"), F.col("lon"), F.col("time")]).alias("lit"))
    assert sorted(r["lit"] for r in back.collect()) == [
        "-33.9#151.2#1.7066592E9", "12.5#45.25#1.7040672E9",
    ]


def test_zorder_nd_matches_fixed_encoders(spark):
    from blazegraph_database_spark.operators import geospatial as geo
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(10.0, 20.0, 1704499200.0), (-45.5, 170.1, 1706227200.0)],
        "lat double, lon double, t double",
    )
    # 2-dim registry key == the fixed lat/lon Morton encoder
    two = geo.GeoDatatype("t2", (geo.GeoDim("lat", -90.0, 90.0), geo.GeoDim("lon", -180.0, 180.0)), bits=8)
    got = df.select(
        geo.zorder_nd([F.col("lat"), F.col("lon")], two).alias("a"),
        geo.zorder_key(F.col("lat"), F.col("lon"), bits=8).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in got)
    # 3-dim registry key == the fixed lat/lon/time encoder
    three = geo.GeoDatatype(
        "t3",
        (geo.GeoDim("lat", -90.0, 90.0), geo.GeoDim("lon", -180.0, 180.0),
         geo.GeoDim("time", 1704067200.0, 1706745600.0)),
        bits=4,
    )
    got3 = df.select(
        geo.zorder_nd([F.col("lat"), F.col("lon"), F.col("t")], three).alias("a"),
        geo.zorder3_key(F.col("lat"), F.col("lon"), F.col("t"), 1704067200, 1706745600, bits=4).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in got3)


def test_range_query_nd(spark):
    from blazegraph_database_spark.operators import geospatial as geo

    dt = geo.get_geo_datatype("geo:lat-lon-time")
    df = spark.createDataFrame(
        [(1, 10.0, 20.0, 100.0), (2, 50.0, 20.0, 100.0), (3, 10.0, 20.0, 900.0)],
        "id long, lat double, lon double, time double",
    )
    out = geo.range_query_nd(df, dt, {"lat": (0.0, 30.0), "time": (0.0, 500.0)})
    assert [r["id"] for r in out.collect()] == [1]
    import pytest as _pt

    with _pt.raises(KeyError):
        geo.range_query_nd(df, dt, {"altitude": (0, 1)})


def _interleave(qlat: int, qlon: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((qlat >> i) & 1) << (2 * i)
        z |= ((qlon >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_ranges_exact_cover():
    # full-depth decomposition covers exactly the quantized rectangle's cells
    bits = 6
    lat0, lat1, lon0, lon1 = -10.0, 35.0, 20.0, 90.0
    rngs = G.zorder_ranges(lat0, lat1, lon0, lon1, bits=bits, max_ranges=10**6, depth_limit=bits)
    qx0, qx1 = G._quantize_py(lat0, -90, 90, bits), G._quantize_py(lat1, -90, 90, bits)
    qy0, qy1 = G._quantize_py(lon0, -180, 180, bits), G._quantize_py(lon1, -180, 180, bits)
    covered = set()
    for lo, hi in rngs:
        covered.update(range(lo, hi + 1))
    expect = {
        _interleave(x, y, bits)
        for x in range(qx0, qx1 + 1)
        for y in range(qy0, qy1 + 1)
    }
    assert covered == expect


def test_zorder_ranges_budget_overcovers():
    bits = 8
    exact = G.zorder_ranges(0, 30, 0, 40, bits=bits, max_ranges=10**6, depth_limit=bits)
    budgeted = G.zorder_ranges(0, 30, 0, 40, bits=bits, max_ranges=8, depth_limit=bits)
    assert len(budgeted) <= 8
    exact_keys = set()
    for lo, hi in exact:
        exact_keys.update(range(lo, hi + 1))
    # every exactly-covered key survives coalescing
    assert all(any(lo <= k <= hi for lo, hi in budgeted) for k in exact_keys)


def test_in_rectangle_zorder_matches_exact(spark):
    import random

    random.seed(7)
    rows = [(i, random.uniform(-90, 90), random.uniform(-180, 180)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    exact = G.in_rectangle(df, -20.0, 42.0, -60.0, 75.0)
    zscan = G.in_rectangle_zorder(df, -20.0, 42.0, -60.0, 75.0, bits=8, max_ranges=16)
    a = sorted(r["id"] for r in exact.collect())
    b = sorted(r["id"] for r in zscan.collect())
    assert a == b and len(a) > 0


def test_zorder_scan_pushes_ranges_to_parquet(spark, tmp_path):
    """On a store persisting the Morton key, the range disjunction is the
    only pruning predicate and reaches the parquet reader as pushed
    filters — row groups outside every range are skipped (the B+Tree
    range-scan analog)."""
    import random

    random.seed(11)
    rows = [(i, random.uniform(-90, 90), random.uniform(-180, 180)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    path = str(tmp_path / "zstore")
    (
        df.withColumn("zkey", G.zorder_key(F.col("lat"), F.col("lon"), bits=8))
        .sort("zkey")
        .write.parquet(path)
    )
    stored = spark.read.parquet(path)
    out = G.in_rectangle_zorder(
        stored, -20.0, 42.0, -60.0, 75.0, zkey_col="zkey", bits=8, max_ranges=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan.split("PushedFilters", 1)[1][:400]
    # and the result still equals the exact predicate
    exact = G.in_rectangle(stored, -20.0, 42.0, -60.0, 75.0)
    assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in exact.collect())


def test_knn_equals_bruteforce_and_expands_bands(spark):
    """kNN with a tiny initial band must still equal brute force (the
    expansion loop and the completeness re-scan both fire), including at
    k > matching points."""
    from pyspark.sql import functions as F

    from blazegraph_database_spark.operators import geospatial as G

    rows = [(i, float((i * 13) % 170 - 85), float((i * 29) % 350 - 175)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, lat double, lon double")
    got = G.knn(df, 0.0, 0.0, k=7, band_deg=1.0).collect()
    brute = (
        df.select(
            "event_id",
            F.round(G.haversine_km(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0)), 1).alias("distance_km"),
        )
        .orderBy("distance_km", "event_id")
        .limit(7)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in brute]
    # k larger than the dataset: returns everything, still ordered
    assert G.knn(df, 0.0, 0.0, k=100, band_deg=1.0).count() == 60


def test_requantize_geo_literals_and_bounds(spark):
    """Registered-config quantization (GeoSpatialLiteralExtension analog):
    BigDecimal-multiply-truncate ingest re-serialization for '#' and WKT
    serializers, and bound quantization matching it."""
    from blazegraph_database_spark.operators.geospatial import (
        GeoFieldSpec, quantize_bound, requantize_geo_literals,
    )

    rows = [
        ("s1", "p", "6.6666666#1.2#7", "dt:app:ll"),      # lon 1.2: decimal-exact
        ("s2", "p", "Point(1,1)", "dt:x:wktLiteral"),
        ("s3", "p", "not#a#number", "dt:app:ll"),          # unparseable: kept
        ("s4", "p", "plain literal", "string"),            # other dt: untouched
    ]
    df = spark.createDataFrame(rows, "s string, p string, o_lex string, o_dt string")
    cfg = {
        "app:ll": [GeoFieldSpec("DOUBLE", 100_000), GeoFieldSpec("DOUBLE", 10),
                   GeoFieldSpec("LONG", 1)],
        "x:wktLiteral": [GeoFieldSpec("DOUBLE", 1_000_000), GeoFieldSpec("DOUBLE", 100_000)],
    }
    got = {r["s"]: r["o_lex"] for r in requantize_geo_literals(df, cfg).collect()}
    assert got["s1"] == "6.66666#1.2#7"   # truncate at 1e-5; 1.2 survives x10 exactly
    assert got["s2"] == "Point(1.0,1.0)"  # WKT re-serialization
    assert got["s3"] == "not#a#number"
    assert got["s4"] == "plain literal"
    assert quantize_bound("1.100000001111", 100_000) == 1.1
    assert quantize_bound("1.2", 10) == 1.2   # decimal math: never 1.19
    assert quantize_bound("-10.35", 10) == -10.3  # truncate toward zero


def test_zorder_scan_codegen_unit_compile_sized(spark):
    """The computed-zkey range scan must keep its fused codegen unit
    compile-sized (r10: predicate pushdown re-inlined the Morton key into
    every range disjunct — 122k generated lines, janino 64 KB failure,
    silent interpreted fallback). Magic-mask spreading + the pushdown
    barrier hold the unit under 8k lines."""
    import contextlib
    import io

    from blazegraph_database_spark.operators import geospatial as G
    from pyspark.sql import functions as F

    pts = spark.range(5000).select(
        ((F.col("id") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 73 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    df = G.in_rectangle_zorder(pts, -20.0, 42.0, -60.0, 75.0, bits=8, max_ranges=16)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="codegen")
        units = buf.getvalue().split("== Subtree")[1:]
        assert units, "no whole-stage codegen unit"
        for i, u in enumerate(units):
            assert u.count("\n") < 8000, f"unit {i}: {u.count(chr(10))} lines"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_zorder_magic_spread_matches_generic_interleave(spark):
    """Magic-mask zorder_key/zorder3_key are bit-identical to the generic
    per-bit zorder_nd interleave (checked dimension-by-dimension to keep
    the parity expression itself codegen-sized)."""
    from blazegraph_database_spark.operators import geospatial as G
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        ((F.col("id") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 73 % 36000) / 100.0 - 180.0).alias("lon"),
        (F.col("id") % 2678400 + 1704067200).cast("double").alias("te"),
    )
    dt2 = G.GeoDatatype(
        "urn:t2", (G.GeoDim("lat", -90.0, 90.0), G.GeoDim("lon", -180.0, 180.0)),
        bits=16,
    )
    dt3 = G.GeoDatatype(
        "urn:t3",
        (G.GeoDim("lat", -90.0, 90.0), G.GeoDim("lon", -180.0, 180.0),
         G.GeoDim("t", 1704067200.0, 1706745600.0)),
        bits=8,
    )
    # stage each side as a column first so the comparison is leaf-vs-leaf
    keyed = df.select(
        G.zorder_key(F.col("lat"), F.col("lon"), 16).alias("m2"),
        G.zorder_nd([F.col("lat"), F.col("lon")], dt2).alias("g2"),
        G.zorder3_key(F.col("lat"), F.col("lon"), F.col("te"),
                      1704067200, 1706745600, 8).alias("m3"),
        G.zorder_nd([F.col("lat"), F.col("lon"), F.col("te")], dt3).alias("g3"),
    ).localCheckpoint()
    bad = keyed.filter((F.col("m2") != F.col("g2")) | (F.col("m3") != F.col("g3")))
    assert bad.count() == 0
