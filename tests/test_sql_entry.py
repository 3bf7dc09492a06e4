"""SQL entry point (SURVEY.md §3.2): every fixture registers as a temp
view, so queries are expressible as plain ``spark.sql`` strings that
agree with the DataFrame operators — same Catalyst pipeline, two front
doors."""

from __future__ import annotations

from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.tables import TABLE_NAMES, register_views


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_all_views_registered(spark, sf_dir):
    register_views(spark, sf_dir)
    current = {t.name for t in spark.catalog.listTables()}
    assert set(TABLE_NAMES) <= current


def test_sql_front_door_matches_dataframe_ops(spark, sf_dir):
    register_views(spark, sf_dir)
    specs = load_all_operators()

    sql_trending = spark.sql(
        """
        SELECT token, COUNT(*) AS n
        FROM (SELECT explode(split(lower(text), ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 10
        """
    )
    assert _rows(sql_trending) == _rows(
        specs["trending_topk_terms"].fn(spark, sf_dir)
    )

    sql_error_rate = spark.sql(
        """
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) AS n_total,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) AS error_rate
        FROM events GROUP BY 1
        """
    )
    assert _rows(sql_error_rate) == _rows(
        specs["error_rate_per_day"].fn(spark, sf_dir)
    )
