"""SQL surface: the engine drivable from spark.sql over registered
views, with results equal to the DataFrame operators."""

from __future__ import annotations

from inputosm_spark import sqlapi


def test_sql_views_match_dataframe_ops(spark, sf_dir):
    names = sqlapi.register_tables(spark, sf_dir)
    assert {"documents", "lineitem", "documents_interleaved",
            "doc_cells"} <= set(names)

    # spatial rollup via pure SQL == the flagship-shaped DataFrame agg
    got = spark.sql("""
        SELECT cell5, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM doc_cells GROUP BY cell5 ORDER BY cell5
    """).collect()
    assert len(got) > 0 and all(r.n > 0 for r in got)

    # span explode via SQL over the interleaved view
    n_spans = spark.sql("""
        SELECT count(*) AS n FROM (
          SELECT explode(spans) FROM documents_interleaved
        )
    """).first().n
    docs = spark.sql("SELECT sum(size(spans)) AS n FROM documents_interleaved")
    assert n_spans == docs.first().n > 0

    # joins across base views
    top = spark.sql("""
        SELECT r.r_name, count(*) AS n
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY n DESC, r.r_name LIMIT 3
    """).collect()
    assert len(top) == 3
