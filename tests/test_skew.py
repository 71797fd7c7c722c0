"""Skew handling: salted two-level aggregation is algebraically exact,
hot-key detection finds the dense cells, salted repartition preserves
rows and actually spreads the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from inputosm_spark.functions import cells
from inputosm_spark.operators import skew
from inputosm_spark.sources.registry import load_table


def _keyed(spark, sf_dir, res=2):
    docs = load_table(spark, sf_dir, "documents")
    lat, lon = cells.point_exprs("doc_id")
    return docs.select(cells.cell_id_expr(lat, lon, res).alias("cell"))


def test_salted_count_equals_plain(spark, sf_dir):
    keyed = _keyed(spark, sf_dir)
    plain = keyed.groupBy("cell").agg(F.count("*").alias("cnt"))
    salted = skew.salted_count(keyed, "cell", n_salt=8)
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_agg_equals_plain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lat, lon = cells.point_exprs("doc_id")
    keyed = docs.select(cells.cell_id_expr(lat, lon, 2).alias("cell"), "n_chars")
    plain = keyed.groupBy("cell").agg(
        F.sum("n_chars").alias("sum_n_chars"), F.max("n_chars").alias("max_n_chars")
    )
    salted = skew.salted_agg(keyed, "cell", {"n_chars": "sum"}, n_salt=8).join(
        skew.salted_agg(keyed, "cell", {"n_chars": "max"}, n_salt=8), "cell"
    )
    j = plain.join(salted, "cell")
    assert j.filter(
        (plain.sum_n_chars != salted.sum_n_chars)
        | (plain.max_n_chars != salted.max_n_chars)
    ).isEmpty()
    assert j.count() == plain.count()


def test_hot_keys_finds_dense_cells(spark, sf_dir):
    # res 1 = 8 world cells -> the hash-uniform corpus puts ~12.5% in
    # each, so a 5% threshold must flag them (hot-set detection works)
    keyed = _keyed(spark, sf_dir, res=1)
    total = keyed.count()
    hot = skew.hot_keys(keyed, "cell", threshold_ratio=0.05)
    rows = hot.collect()
    assert rows, "coarse res-1 cells must concentrate enough to be hot"
    for r in rows:
        assert r.cnt > total * 0.05


def test_repartition_salted_preserves_rows_and_spreads(spark, sf_dir):
    keyed = _keyed(spark, sf_dir, res=1)
    hot = skew.hot_keys(keyed, "cell", threshold_ratio=0.05)
    out = skew.repartition_salted(keyed, "cell", hot, n_salt=8)
    assert out.count() == keyed.count()
    hottest = hot.orderBy(F.desc("cnt")).first().cell
    # AQE coalesces the fixture-sized shuffle back to one physical
    # partition, so assert the operator's contract directly: rows of a
    # hot key carry >1 distinct salt (the partitioning key spreads them)
    n_salts = (
        out.filter(F.col("cell") == hottest).select("__salt").distinct().count()
    )
    assert n_salts > 1, "hot key must be spread over multiple salts"
    cold = out.filter(F.col("cell") != hottest)
    hot_ids = {r.cell for r in hot.collect()}
    assert (
        cold.filter(~F.col("cell").isin(list(hot_ids)))
        .filter(F.col("__salt") != 0)
        .isEmpty()
    ), "cold keys keep salt 0 (stay co-located)"
