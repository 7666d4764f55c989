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


# Epoch-micros extraction is the type-aware shared helper
# functions/eventtime.py: TIMESTAMP (LTZ) maps to the true instant
# (monotonic across DST wall-clock repeats), TIMESTAMP_NTZ to its
# session-independent wall-clock micros.

# column names the temporal joins claim internally; caller columns must
# not shadow them (a left column literally named "_ts" would otherwise
# project twice and fail later with an opaque ambiguous-reference error;
# a right column named "_rts" would duplicate the payload struct field)
_TEMPORAL_RESERVED = frozenset(
    {"_ts", "_side", "_p", "_m", "_rts", "_mrts", "_us0", "_us1", "_bin"}
)


def _check_reserved(cols, what: str) -> None:
    hit = _TEMPORAL_RESERVED.intersection(cols)
    if hit:
        raise ValueError(
            f"{what} columns {sorted(hit)} shadow internal temporal-join "
            f"names {sorted(_TEMPORAL_RESERVED)}; rename them first"
        )


def _same_ts_flavor(ldf: DataFrame, lcol: str, rdf: DataFrame, rcol: str):
    """Both timestamp columns must be the same flavor (both LTZ or both
    NTZ): each flavor has its own epoch convention (instant vs wall
    time), and mixing them would compare/bin the two sides on different
    clocks. Returns the shared dataType."""
    lt, rt = ldf.schema[lcol].dataType, rdf.schema[rcol].dataType
    if lt != rt:
        raise TypeError(
            f"timestamp flavor mismatch: {lcol} is {lt} but {rcol} is {rt};"
            " cast one side so both are TIMESTAMP or both TIMESTAMP_NTZ"
        )
    return lt


def _floordiv_bin(us_col: str, bin_us: int) -> F.Column:
    """Exact floor division of an integer-micros COLUMN (by name) by an
    integer bin width, entirely in BIGINT: subtracting ``pmod`` makes
    the numerator exactly divisible (pmod is non-negative = floor
    semantics for pre-1970 stamps), and SQL ``div`` is integer
    division, exact at every magnitude — a DOUBLE ``floor(us/d)`` is
    only exact below 2^53 micros (~year 2255) and can mis-bin beyond."""
    return F.expr(f"({us_col} - pmod({us_col}, {bin_us})) div {bin_us}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple = (),
    tolerance_us: int | None = None,
    matched_ts_col: str = "matched_ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row of
    the same ``on`` key at-or-before (``backward``) / at-or-after
    (``forward``) the left timestamp, optionally within ``tolerance_us``
    microseconds (matches outside tolerance become NULL — any farther
    candidate is farther still, so there is no fallback match).

    The reference engine has no temporal joins (SURVEY.md §2.7 — it is a
    per-document extractor); this is a first-class relational addition
    in the family Spark itself lacks (brief: "as-of join, range join").

    Scale design — union + ordered window, NOT a range join:
    a join-then-filter ``l.ts >= r.ts`` inequality join is a per-key
    cross product (10^12 × replay-history rows explodes); instead both
    sides are unioned on the key and scanned once in timestamp order, so
    the plan is ONE hash exchange on ``on`` plus a per-key sort —
    identical shape to sort-merge join, no row amplification. Right rows
    order before left rows at equal timestamps (``_side`` tie-break), so
    the match is inclusive. Known caveat shared with every windowed
    operator: a single hot key funnels through one task — pre-aggregate
    the right side per (key, ts) (also required for determinism: with
    duplicate right rows at the same key+timestamp the winner would be
    partitioning-dependent, exactly like DuckDB/pandas ASOF).

    ``value_cols`` are carried from the matched right row as-is and must
    not collide with left column names; the matched right timestamp is
    emitted as ``matched_ts_col``. Left rows with no match (or matched
    outside tolerance) keep NULLs — a LEFT as-of; filter
    ``matched_ts_col IS NOT NULL`` for the inner form.

    NULL semantics match DuckDB ASOF / pandas merge_asof: right rows
    with a NULL key or NULL timestamp can never be a match (they are
    dropped up front — a NULL-timestamp right row would otherwise sort
    first and leak its values into every matchless left row), and a
    left row with a NULL key or timestamp gets a NULL match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    for c in (on, left_ts):
        if c not in left.columns:
            raise ValueError(f"left is missing column {c!r} (has {left.columns})")
    for c in (on, right_ts, *value_cols):
        if c not in right.columns:
            raise ValueError(f"right is missing column {c!r} (has {right.columns})")
    collisions = set(value_cols) & set(left.columns)
    if collisions or matched_ts_col in left.columns:
        raise ValueError(
            f"right value columns collide with left columns: "
            f"{sorted(collisions) or [matched_ts_col]}"
        )
    if matched_ts_col in value_cols:
        raise ValueError(
            f"matched_ts_col {matched_ts_col!r} collides with value_cols"
        )
    _check_reserved(left.columns, "left")
    _check_reserved(right.columns, "right")
    _check_reserved([matched_ts_col], "matched_ts_col")
    ts_type = _same_ts_flavor(left, left_ts, right, right_ts)

    right = right.filter(F.col(right_ts).isNotNull() & F.col(on).isNotNull())
    left_cols = list(left.columns)
    payload = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in value_cols],
    )
    r_rows = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c != on
        ],
    )
    null_payload_src = right.select(payload.alias("_p")).schema["_p"].dataType
    l_rows = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(null_payload_src).alias("_p"),
        *[F.col(c) for c in left_cols if c != on],
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r_rows.unionByName(l_rows)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        # a NULL-timestamp left row has no "before"/"after": no match
        .withColumn("_m", F.when(F.col("_ts").isNotNull(), F.col("_m")))
    )
    if tolerance_us is not None:
        # NULL-safe: an unmatched row has NULL _m -> NULL diff -> NULL.
        # Flavor-aware distance: LTZ compares true instants (immune to
        # DST wall-clock repeats), NTZ compares wall clocks — the shared
        # idiom (functions/eventtime.py) takes simple column names, so
        # the matched struct field is projected to _mrts first.
        from pyspark.sql.types import TimestampNTZType

        from readabilityimproved_spark.functions.eventtime import (
            ntz_epoch_micros,
        )

        filled = filled.withColumn("_mrts", F.col("_m._rts"))
        if isinstance(ts_type, TimestampNTZType):
            diff = ntz_epoch_micros("_ts") - ntz_epoch_micros("_mrts")
        else:
            diff = F.unix_micros(F.col("_ts")) - F.unix_micros(
                F.col("_mrts")
            )
        if direction == "forward":
            diff = -diff
        filled = filled.withColumn(
            "_m", F.when(diff <= F.lit(int(tolerance_us)), F.col("_m"))
        ).drop("_mrts")
    return filled.select(
        *[F.col(c) for c in left_cols],
        F.col("_m._rts").alias(matched_ts_col),
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "t0",
    end_ts: str = "t1",
    bin_us: int = 3_600_000_000,
    max_span_bins: int = 10_000,
) -> DataFrame:
    """Interval containment join: point rows joined to every interval
    row of the same key with ``start_ts <= point_ts <= end_ts``
    (inclusive both ends), WITHOUT an inequality join.

    Scale design — temporal binning: a raw ``BETWEEN`` theta-join is a
    BroadcastNestedLoop/cartesian per key (quadratic at 10^12 rows).
    Instead both sides are bucketed into fixed ``bin_us`` epoch bins:
    each interval is exploded onto every bin it overlaps
    (``sequence(bin(t0), bin(t1))``), each point lands in exactly ONE
    bin, and the join becomes a plain equi-join on (key, bin) followed
    by the exact containment filter. A point joins each covering
    interval's copy in its own bin exactly once, so no dedup pass is
    needed. Pick ``bin_us`` near the typical interval length: one bin ≈
    one extra copy per interval. Row amplification is bounded by
    ``max_span_bins`` — an interval spanning MORE than that many bins
    raises (executor-side ``raise_error``) instead of silently exploding
    the build side; degenerate intervals (``t1 < t0``) match nothing
    and are dropped.
    Bin ids use exact BIGINT floor division (`_floordiv_bin`), so a
    point exactly on a bin boundary bins identically on both sides at
    every epoch magnitude. Epochs are flavor-aware (`epoch_micros`):
    LTZ columns bin by true instant (monotonic across DST wall-clock
    repeats), NTZ by wall clock; mixing flavors across the two sides
    raises. NULL keys, NULL timestamps and degenerate (t1 < t0)
    intervals match nothing.
    """
    for c in (on, point_ts):
        if c not in points.columns:
            raise ValueError(f"points is missing column {c!r} (has {points.columns})")
    for c in (on, start_ts, end_ts):
        if c not in intervals.columns:
            raise ValueError(
                f"intervals is missing column {c!r} (has {intervals.columns})"
            )
    if bin_us <= 0 or max_span_bins <= 0:
        raise ValueError("bin_us and max_span_bins must be positive")
    collisions = (set(points.columns) & set(intervals.columns)) - {on}
    if collisions:
        raise ValueError(f"point/interval column collision: {sorted(collisions)}")
    _check_reserved(points.columns, "points")
    _check_reserved(intervals.columns, "intervals")
    _same_ts_flavor(points, point_ts, intervals, start_ts)
    _same_ts_flavor(intervals, start_ts, intervals, end_ts)

    from readabilityimproved_spark.functions.eventtime import epoch_micros

    b0 = _floordiv_bin("_us0", bin_us)
    b1 = _floordiv_bin("_us1", bin_us)
    span_ok = (b1 - b0) < F.lit(max_span_bins)
    bins = F.when(
        span_ok, F.sequence(b0, b1)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_span_bins} "
                    f"bins of {bin_us} us; raise bin_us or max_span_bins "
                ),
                F.col(start_ts).cast("string"),
                F.lit(" .. "),
                F.col(end_ts).cast("string"),
            )
        )
    )
    iv = (
        intervals.filter(F.col(end_ts) >= F.col(start_ts))
        .withColumn("_us0", epoch_micros(intervals, start_ts))
        .withColumn("_us1", epoch_micros(intervals, end_ts))
        .withColumn("_bin", F.explode(bins))
        .drop("_us0", "_us1")
    )
    pt = (
        points.withColumn("_us0", epoch_micros(points, point_ts))
        .withColumn("_bin", _floordiv_bin("_us0", bin_us))
        .drop("_us0")
    )
    return (
        pt.join(iv, [on, "_bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )


def profit_by_nation(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q9-shaped snowflake rollup: revenue per (supplier nation,
    ship year) for one part type — the multi-dimension join exercising
    the full dimension chain (part, supplier, nation).

    Plan shape (pinned): the part-type filter prunes the part dim
    BEFORE it broadcasts, then THREE BroadcastHashJoins keep the
    10^12-row lineitem fact from ever shuffling on a join key; the only
    exchange is the final ~(nations × years) aggregation, fed by
    map-side partial aggregation. Revenue is summed in exact integer
    cents (order-independent), so the result is identical at any
    partitioning/cluster size."""
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .join(
            F.broadcast(supplier),
            lineitem["l_suppkey"] == supplier["s_suppkey"],
        )
        .join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.sum(signed_scaled_int(disc, 100)).alias("revenue_cents"),
            F.count("*").alias("n_shipments"),
        )
    )


def corpus_rollup(documents: DataFrame) -> DataFrame:
    """Grouping-sets corpus report: doc counts and character volume per
    (lang, source), per lang subtotal, and grand total in ONE pass —
    ``ROLLUP`` computes all three levels from a single shuffle with
    map-side partial aggregation (vs three separate groupBys = three
    scans of a 10^12-row table). ``gid`` is the grouping bitmask
    (first rollup column = most significant bit, the convention shared
    by Spark ``grouping_id()`` and DuckDB ``GROUPING()``), which
    disambiguates a genuinely-NULL group value from a subtotal row."""
    return documents.rollup("lang", "source").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str = "doc_id", fp_col: str = "fp"
) -> DataFrame:
    """Set-operation snapshot diff between two corpus fingerprints:
    rows tagged ``both`` / ``only_old`` / ``only_new`` by DISTINCT
    intersect/except over (id, fingerprint).

    Scale: callers pass (id, fingerprint) projections, never text — the
    three set ops shuffle narrow hashes only, and Catalyst plans each
    as an aggregate/hash-join over the pair, so the cost is three
    exchanges over ~16-byte rows regardless of document size. Inputs
    are expected distinct per (id, fp) (fingerprint tables are); the
    DISTINCT semantics of intersect/subtract make the output a set
    either way."""
    a = old.select(id_col, fp_col)
    b = new.select(id_col, fp_col)
    tag = lambda df, s: df.withColumn("status", F.lit(s))  # noqa: E731
    return (
        tag(a.intersect(b), "both")
        .unionByName(tag(a.subtract(b), "only_old"))
        .unionByName(tag(b.subtract(a), "only_new"))
    )


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
