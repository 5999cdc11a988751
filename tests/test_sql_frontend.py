"""SQL front-end consistency: for ANSI-compatible contract queries, the
SAME SQL string the DuckDB oracle runs also runs on Spark SQL (temp views
over the testdata tables) and returns identical values to the DataFrame
plan — engine users get an equivalent SQL surface for free.

Excluded by design (dialect-divergent constructs baked into the oracle
text): events_cube_dow_type (DuckDB dayofweek is 0-based, the oracle
carries a +1), q1_keyword_phrase / q11_entity_specific (oracle spells
Spark's boost arithmetic in DuckDB-specific coercion order)."""

import pytest

import __spark_entry__ as entry
from rassengine_spark.session import load_tables

SF = "/root/testdata/sf0.001"

COMPATIBLE = [
    "tpch_q1_pricing", "tpch_q3_shipping", "q14_has_data", "dedup_exact",
    "tpch_q5_region_revenue", "j1_semi_join_resolved", "j2_content_join",
    "events_tumbling_counts", "events_interval_join",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue", "orders_running_total", "skew_salted_agg",
    "events_distinct_daily", "tpch_q4_late_orders", "tpch_q18_big_orders",
    "tpch_q19_disjunctive_revenue", "tpch_q7_nation_volume",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q13_order_distribution", "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue", "tpch_q22_inactive_customers",
    "tpch_q11_important_parts", "tpch_q12_priority_mix",
    "tpch_q16_supplier_counts", "tpch_q20_heavy_shippers",
    "tpch_q21_waiting_orders", "events_pivot_daily",
    "events_moving_avg_7d", "events_funnel", "events_volume_anomaly",
    "events_except_buyers", "m1_intent_route",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    for n, df in load_tables(spark, SF).items():
        df.createOrReplaceTempView(n)


@pytest.mark.parametrize("name", COMPATIBLE)
def test_oracle_sql_runs_on_spark_sql(spark, name):
    df_plan = entry.queries()[name](spark, SF)
    sql_plan = spark.sql(entry.oracle_sql()[name])
    assert _rows(df_plan) == _rows(sql_plan)
