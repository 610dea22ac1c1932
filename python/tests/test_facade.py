"""End-to-end test for the graftspark PySpark facade.

Runs the Scala engine through the Py4J bridge and checks the profile
numbers against independently-computed PySpark aggregations over the same
parquet table (the same oracle discipline as the driver's DuckDB checks).

Run directly (pyspark must be importable and the graft classes compiled):

    python3 python/tests/test_facade.py [sf_dir]

or via pytest. GRAFT_CLASSES overrides the default classpath entry.
"""

import os
import shutil
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "python"))

GRAFT_CLASSES = os.environ.get(
    "GRAFT_CLASSES", os.path.join(REPO, "target", "scala-2.13", "classes"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from pyspark.sql import SparkSession
        _spark = (
            SparkSession.builder
            .master("local[4]")
            .appName("graftspark-facade-test")
            .config("spark.driver.extraClassPath", GRAFT_CLASSES)
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    return _spark


def _orders():
    return _get_spark().read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_agg_profiles_matches_sql_oracle():
    from pyspark.sql import functions as F
    from graftspark import new_profiling_session

    orders = _orders()
    prof = (
        new_profiling_session(orders, "orders-test")
        .groupBy("o_orderstatus")
        .aggProfiles()
    )
    got = {
        r["o_orderstatus"]: r
        for r in prof.select(
            "o_orderstatus",
            F.col("o_totalprice.count").alias("cnt"),
            F.col("o_totalprice.null_count").alias("nulls"),
            F.col("o_totalprice.numbers.min").alias("mn"),
            F.col("o_totalprice.numbers.max").alias("mx"),
            F.col("o_totalprice.numbers.mean").alias("mean"),
            F.col("o_orderpriority.strings.count").alias("scnt"),
        ).collect()
    }
    want = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus").agg(
            F.count("o_totalprice").alias("cnt"),
            F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)
                  ).alias("nulls"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            F.avg("o_totalprice").alias("mean"),
            F.count("o_orderpriority").alias("scnt"),
        ).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k, w in want.items():
        g = got[k]
        assert g["cnt"] == w["cnt"], (k, g["cnt"], w["cnt"])
        assert g["nulls"] == w["nulls"]
        assert g["scnt"] == w["scnt"]
        assert abs(g["mn"] - float(w["mn"])) < 1e-6
        assert abs(g["mx"] - float(w["mx"])) < 1e-6
        assert abs(g["mean"] - float(w["mean"])) < 1e-6 * abs(float(w["mean"]))
    print(f"aggProfiles: {len(want)} groups match the PySpark oracle")


def test_merge_profiles_rolls_up():
    from pyspark.sql import functions as F
    from graftspark import merge_profiles, new_profiling_session

    orders = _orders()
    per_status = (
        new_profiling_session(orders, "m")
        .groupBy("o_orderstatus")
        .aggProfiles()
    )
    merged = merge_profiles(per_status)  # global rollup, no keys
    row = merged.select(
        F.col("o_totalprice.count").alias("cnt"),
        F.col("o_totalprice.numbers.min").alias("mn"),
        F.col("o_totalprice.numbers.max").alias("mx"),
    ).collect()[0]
    want = orders.agg(
        F.count("o_totalprice"), F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    assert row["cnt"] == want[0]
    assert abs(row["mn"] - float(want[1])) < 1e-6
    assert abs(row["mx"] - float(want[2])) < 1e-6
    print("mergeProfiles: rollup of per-status profiles equals whole-table profile")


def test_export_proto_and_parquet_sink():
    from pyspark.sql import functions as F
    from graftspark import new_profiling_session

    orders = _orders()
    sess = new_profiling_session(orders, "wire").groupBy("o_orderstatus")
    wire = sess.aggProfiles(timestamp_ms=1700000000000)
    rows = wire.select(F.length("why_profile").alias("n")).collect()
    assert len(rows) == orders.select("o_orderstatus").distinct().count()
    assert all(r["n"] > 100 for r in rows), "wire profiles suspiciously small"

    out = tempfile.mkdtemp(prefix="graftspark-")
    try:
        path = os.path.join(out, "profiles.parquet")
        sess.aggParquet(path)
        back = _get_spark().read.parquet(path)
        assert back.count() == len(rows)
        assert "o_totalprice" in back.columns
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(f"exportProto: {len(rows)} wire profiles + parquet sink round-trip")


def test_time_column_windows():
    from graftspark import new_profiling_session

    orders = _orders()
    prof = (
        new_profiling_session(orders, "bytime", time_column="o_orderdate")
        .aggProfiles()
    )
    n_days = orders.select("o_orderdate").distinct().count()
    assert prof.count() == n_days  # 1-day cadence over date column
    assert "window" in prof.columns
    print(f"withTimeColumn: {n_days} daily windows")


def test_model_metrics():
    from pyspark.sql import functions as F
    from graftspark import new_profiling_session

    orders = _orders()
    labeled = orders.select(
        "o_orderstatus",
        F.col("o_totalprice").alias("target"),
        (F.col("o_totalprice") * 1.01).alias("prediction"),
    )
    prof = (
        new_profiling_session(labeled, "reg")
        .withRegressionModel("prediction", "target")
        .aggProfiles()
    )
    row = prof.select(
        F.col("regression_metrics.count").alias("cnt"),
        F.col("regression_metrics.mae").alias("mae"),
    ).collect()[0]
    want = labeled.agg(
        F.count("target"),
        F.avg(F.abs(F.col("prediction") - F.col("target"))),
    ).collect()[0]
    assert row["cnt"] == want[0]
    assert abs(row["mae"] - float(want[1])) < 1e-9 * max(1.0, float(want[1]))

    cls = labeled.select(
        (F.col("target") > 150000).cast("string").alias("t"),
        (F.col("prediction") > 150000).cast("string").alias("p"),
    )
    cm = (
        new_profiling_session(cls, "cls")
        .withClassificationModel("p", "t")
        .aggProfiles()
    )
    assert "classification_metrics" in cm.columns
    assert cm.count() == 1
    print(f"model metrics: regression count={row['cnt']} mae ok; "
          "confusion matrix present")


def test_estimate_segments():
    from graftspark import estimate_segments

    orders = _orders()
    segs = estimate_segments(orders, max_segments=30)
    assert isinstance(segs, list)
    for s in segs:
        assert s in orders.columns
    print(f"estimate_segments -> {segs}")


def main():
    global SF_DIR
    if len(sys.argv) > 1:
        SF_DIR = sys.argv[1]
    test_agg_profiles_matches_sql_oracle()
    test_merge_profiles_rolls_up()
    test_export_proto_and_parquet_sink()
    test_time_column_windows()
    test_model_metrics()
    test_estimate_segments()
    print("ALL FACADE TESTS PASSED")


if __name__ == "__main__":
    main()
