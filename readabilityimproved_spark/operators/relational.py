"""Relational/analytic operators over warehouse-shaped tables.

The reference engine has no joins or aggregations (SURVEY.md §2.7: it is
a pure per-document extractor), but an analytics engine's user hits
joins first — these are the engine's first-class relational additions,
exercised by the driver over the shipped TPC-H-ish tables (orders,
customer, nation, lineitem).

Scale design (100 TB / 10^12-row fact tables):

* **star joins broadcast the dimension side explicitly** (`F.broadcast`)
  — nation is tiny and customer is ~1.5% of orders at any TPC-H scale,
  so the fact table NEVER shuffles on the join key; the only exchange
  is the final grouped aggregation on a low-cardinality key (with
  map-side partial aggregation, so the shuffle carries one row per
  task × group, not per input row);
* **exact money arithmetic**: all double-valued measures are scaled to
  integer cents *before* summation (sign-aware half-away-from-zero
  ``floor(|x|*100 + 0.5)*sign(x)`` — IEEE multiply+floor is
  deterministic, and BIGINT addition is associative),
  so results are independent of partitioning/summation order — a
  ``sum(double)`` changes value when the cluster size changes;
* **top-k-per-group** uses one window over (group, order) — a single
  hash exchange on the group key, then a streaming rank+filter; no
  global sort;
* **anti joins** keep the *smaller* distinct key-set on the build side:
  Catalyst/AQE broadcast it when it fits, and the probe side never
  re-partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def signed_scaled_int(col: F.Column, scale: float) -> F.Column:
    """Deterministic half-AWAY-FROM-ZERO integer scaling of a double.

    ``floor(x*scale + 0.5)`` alone is half-up toward +infinity, which
    rounds NEGATIVE amounts (refunds, negative event values) the wrong
    way (-1.005 -> -100 cents instead of -101); rounding |x| and
    re-applying the sign is symmetric, matching conventional money
    rounding. Oracles use the identical formula (sign-aware on both
    sides), so parity is by construction."""
    return (F.floor(F.abs(col) * scale + F.lit(0.5)) * F.signum(col)).cast(
        "bigint"
    )


def _cents(col: str) -> F.Column:
    """Exact integer cents from a 2-decimal DOUBLE money column."""
    return signed_scaled_int(F.col(col), 100)


def salted_topk(
    df: DataFrame,
    group_col: str,
    order_exprs: list,
    k: int,
    salt_key_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact top-k per group WITHOUT funneling each group through one
    window task.

    A plain ``row_number over (partition by group)`` sends every row of
    a group to a single task — with low-cardinality or skewed groups
    (5 market segments; one giant crawl domain) that is a straggler at
    10^12 rows. Two phases, both exact: (1) rank within
    (group, hash-salt) and keep k per salt — the global top-k is a
    subset of the union of per-salt top-ks, so nothing is lost;
    (2) re-rank the survivors (≤ k × salt_buckets rows per group, tiny)
    for the final positions. Adds a column ``rank`` (1-based)."""
    work = df
    if salt_buckets > 1:
        ws = Window.partitionBy(group_col, "_salt").orderBy(*order_exprs)
        work = (
            df.withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.col(salt_key_col)), F.lit(salt_buckets)),
            )
            .withColumn("_r", F.row_number().over(ws))
            .filter(F.col("_r") <= k)
            .drop("_salt", "_r")
        )
    w = Window.partitionBy(group_col).orderBy(*order_exprs)
    return work.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def star_join_rollup(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Orders ⋈ customer ⋈ nation star join with a grouped rollup:
    per (nation, order priority) order counts and exact revenue cents.

    Plan shape (pinned by tests/test_round3.py): two BroadcastHashJoins
    (dims broadcast), ONE exchange — the 125-group aggregation."""
    return (
        orders.join(
            F.broadcast(customer),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("revenue_cents"),
        )
    )


def topk_orders_per_segment(
    orders: DataFrame, customer: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k orders by value within each customer market segment.

    One broadcast join (customer is the small side), then the salted
    two-phase top-k: a 5-value segment key would otherwise funnel the
    whole fact table through 5 window tasks."""
    priced = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    ).select(
        "c_mktsegment",
        "o_orderkey",
        _cents("o_totalprice").alias("price_cents"),
    )
    return salted_topk(
        priced,
        "c_mktsegment",
        [F.col("price_cents").desc(), F.col("o_orderkey").asc()],
        k,
        salt_key_col="o_orderkey",
    ).select("c_mktsegment", "o_orderkey", "price_cents", "rank")


def customers_without_orders(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Left-anti 'resume'-shaped query: customers that placed no order
    (the same shape as the pipeline's checkpoint-resume filter: done
    keys are anti-joined away). The distinct custkey build side is
    bounded by |customer| regardless of |orders|."""
    return customer.join(
        orders.select("o_custkey").distinct(),
        customer["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary over the big fact table: the
    ship-date filter is pushed to the parquet scan (literal timestamp
    predicate, verified in the plan's PushedFilters), partial
    aggregation runs map-side, and the final exchange carries ~4 groups.
    disc_price = extendedprice*(1-discount) is computed per-row in
    IEEE double (deterministic), then scaled to exact cents before the
    order-sensitive step (the sum)."""
    cut = F.lit(f"{cutoff} 00:00:00").cast("timestamp_ntz")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= cut)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("sum_qty_cents"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(signed_scaled_int(disc, 100)).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
    )
