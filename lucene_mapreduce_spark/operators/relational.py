"""Warehouse-relational analytics over the TPC-H-shaped tables.

The reference engine's report jobs join its index tables against dimension
files and aggregate (XdiReportReducer.java's join-then-count loops;
SURVEY.md SS2.4-2.5 J/A families). This module exercises those same join +
aggregate shapes at warehouse scale on the relational side of the testdata
(region nation customer supplier part orders lineitem) with the classic
TPC-H query patterns: partial-aggregatable scans, broadcast dimension
joins, semi-joins, group-filter (HAVING) joins back to facts, quantile
segmentation, and basket self-joins.

Scale posture (100 TB): facts (lineitem, orders) are only ever scanned,
filtered, and hash-aggregated on their natural keys; dimensions ride
broadcast joins; the one self-join (part_affinity_lift) is bounded by
per-order basket size and Apriori-pruned before the join. Every float
aggregate is rounded per-row and summed as DECIMAL so results are
order-free and engine-exact (CLAUDE.md determinism rules).

Determinism note: prices/discounts/taxes are 2-dp values and quantities
are integral (TPC-H shapes), so per-row products like
extendedprice*(1-discount) are computed identically in float64 by both
engines, and a 4-dp round before the DECIMAL sum is far from any
representation boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.operators.parity import load

# Pinned analysis parameters (shared with the oracles; scale-free).
PRICING_CUTOFF = "2000-12-01"
PRIORITY_WINDOW = ("1997-01-01", "1997-07-01")
LATE_SHIP_DAYS = 60
VOLUME_REGION = "ASIA"
VOLUME_WINDOW = ("1996-01-01", "1997-01-01")
LARGE_ORDER_QTY = 250
RETURNED_TOP_K = 20
AFFINITY_MIN_SUPPORT = 2
AFFINITY_TOP_K = 20


def _dec_sum(col, scale: int = 4, out: str | None = None):
    """Order-free exact sum of a float column: round per row, accumulate as
    DECIMAL (associative integer arithmetic), cast the exact total back to
    double. DuckDB twin: round(x, s)::DECIMAL(28,s)."""
    return F.sum(F.round(col, scale).cast(f"decimal(28,{scale})"))


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan pricing summary of shipped lineitems.

    The canonical partial-aggregate report (reference analogue: the
    XdiReportReducer count/sum loops over one input). Catalyst plan: one
    parquet scan with the shipdate filter pushed down, map-side partial
    hash aggregate on the 6-ish (returnflag, linestatus) groups, one
    tiny shuffle. No joins; scales linearly with the fact table."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp")
    )
    ep = F.col("l_extendedprice")
    disc_price = ep * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.round(_dec_sum(ep, 2).cast("double"), 4).alias("sum_base_price"),
            F.round(_dec_sum(disc_price, 4).cast("double"), 4).alias(
                "sum_disc_price"
            ),
            # charge = ep*(1-d)*(1+t) is an exact SIX-dp decimal (2dp x 2dp
            # x 2dp); rounding it at 4dp would sit on genuine .5 boundaries
            # where engine tie rules differ — 6dp is boundary-free exact
            F.round(_dec_sum(charge, 6).cast("double"), 6).alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("long")).cast("double") / n, 6
            ).alias("avg_qty"),
            F.round(_dec_sum(ep, 2).cast("double") / n, 6).alias("avg_price"),
            F.round(_dec_sum(F.col("l_discount"), 2).cast("double") / n, 6).alias(
                "avg_disc"
            ),
            n.cast("long").alias("n_lines"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter-window that had at least one
    late-shipping line (shipdate >= orderdate + 60 days), counted per
    priority. The EXISTS is a LEFT SEMI join — Spark never materializes
    the multiplicity, so the fact-fact join carries only the order keys
    that matter and the aggregate stays tiny."""
    lo, hi = PRIORITY_WINDOW
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returned items
    (l_returnflag = 'R'), with the nation name from a broadcast dim.
    Revenue is an exact DECIMAL sum, so the top-k rank (revenue DESC,
    custkey ASC) is engine-identical. Plan: lineitem filter+agg to order
    grain, join orders (fact-fact, key-partitioned), agg to customer
    grain, broadcast-join customer+nation."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = li.select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
        )
        .cast("decimal(28,4)")
        .alias("rev"),
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("revenue"))
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    from pyspark.sql.window import Window

    joined = per_cust.join(
        F.broadcast(cust), per_cust.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    ranked = joined.select(
        "c_custkey",
        "c_name",
        "n_name",
        F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
        F.row_number()
        .over(Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()))
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= RETURNED_TOP_K).orderBy("rank")


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the supplier sit in the same nation of one region, over a
    one-year window. Dims (region, nation, supplier, customer at test
    scale) broadcast; the two fact legs (orders filtered by date,
    lineitem) hash-join on their keys. At 100 TB customer stops being
    broadcastable — that leg becomes a key-partitioned shuffle join, the
    plan is otherwise unchanged."""
    lo, hi = VOLUME_WINDOW
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name") == VOLUME_REGION
    )
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
        )
        .cast("decimal(28,4)")
        .alias("rev"),
    )
    j = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey", "n_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum("rev").cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, joined back to customer. The HAVING runs at order grain
    BEFORE any join (groupBy lineitem on orderkey), so only qualifying
    keys reach the orders/customer joins — the 100-TB-safe ordering."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic CRM rollup the reference's per-user report jobs approximate.
    Each metric is quartile-coded with ntile(4) over a TOTAL order
    (metric, custkey) so bucket edges are engine-identical; output is the
    segment lattice with customer counts. One groupBy over orders, three
    window passes over the 1-row-per-customer aggregate (tiny), no joins
    against facts after the first aggregate."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    ref_day = orders.agg(F.max("o_orderdate").alias("d"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(28,2)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(ref_day))
        .withColumn("recency_days", F.datediff(F.col("d"), F.col("last_order")).cast("long"))
    )
    coded = per_cust.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m_q"),
    )
    return (
        coded.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over co-ordered parts: support and lift for
    part pairs appearing in the same order. Shape: collapse to DISTINCT
    (order, part) first, self-join within order with pa < pb (bounded by
    basket size, <= ~13 lines/order), HAVING on pair support, lift =
    n_ab * N / (n_a * n_b) from broadcast per-part counts. The Apriori
    observation (a pair is frequent only if both parts are) means at
    real scale the per-part count table prunes the self-join inputs;
    baskets bound the blowup regardless."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    part_n = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_part")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
    )
    na = part_n.select(F.col("l_partkey").alias("pa"), F.col("n_part").alias("n_a"))
    nb = part_n.select(F.col("l_partkey").alias("pb"), F.col("n_part").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "pa")
        .join(F.broadcast(nb), "pb")
        .select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double")
                * F.lit(float(n_orders))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.col("n_ab").desc(), F.col("lift").desc(), F.col("pa"), F.col("pb")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= AFFINITY_TOP_K).orderBy("rank")


def affinity_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the co-order
    part graph (edges = part pairs co-ordered in >= AFFINITY_MIN_SUPPORT
    orders, oriented pa < pb). Triangles enumerate as e1=(a,b), e2=(b,c),
    e3=(a,c) — each counted once under the a<b<c orientation, the standard
    distributed pattern (at real scale the join keys are degree-ordered
    first so the high-degree node never anchors the wedge; the support
    threshold already prunes the graph here). Wedges from integer degree
    counts; clustering = 3*triangles/wedges over exact BIGINTs."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("y2"), F.col("pb").alias("z"))
    e3 = edges.select(F.col("pa").alias("x3"), F.col("pb").alias("z3"))
    tri = (
        e1.join(e2, e1.y == e2.y2)
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        wedges.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_parts",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ).alias("global_clustering"),
        )
    )


def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per nation:
    revenue share of each supplier within its nation, HHI = sum of
    squared shares (1/n = perfectly even, 1.0 = monopoly). Revenue is an
    exact DECIMAL sum; shares divide two exact decimals cast to double
    (identical chain both engines); the share-squared sum re-enters
    DECIMAL at 12dp before aggregation — the entropy-sum rule, because a
    raw double sum over suppliers would be partition-order-dependent."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
        )
        .cast("decimal(28,4)")
        .alias("rev"),
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("rev").alias("srev"))
    )
    per_nation = per_supp.groupBy("s_nationkey").agg(
        F.sum("srev").alias("nrev"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share = F.col("srev").cast("double") / F.col("nrev").cast("double")
    hhi = (
        per_supp.join(per_nation, "s_nationkey")
        .select(
            "s_nationkey",
            "n_suppliers",
            F.col("nrev"),
            F.round(share * share, 12).cast("decimal(28,12)").alias("sq"),
        )
        .groupBy("s_nationkey", "n_suppliers", "nrev")
        .agg(F.round(F.sum("sq").cast("double"), 6).alias("hhi"))
    )
    return (
        hhi.join(F.broadcast(nation), hhi.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "n_suppliers",
            F.round(F.col("nrev").cast("double"), 4).alias("revenue"),
            "hhi",
        )
        .orderBy("n_name")
    )


EQUIDEPTH_BINS = 8


def equidepth_histogram_totals(
    spark: SparkSession, sf_dir: str, bins: int = EQUIDEPTH_BINS
) -> DataFrame:
    """Equi-depth (quantile-binned) histogram of order totals: bin edges
    are exact type-7 quantiles at i/bins (Spark `percentile` == DuckDB
    `quantile_cont`, the dl_percentiles parity), each order lands in the
    bin counted by edges it strictly exceeds. The optimizer-statistics
    histogram shape (equi-WIDTH is histogram_facets; ES's
    variable_width_histogram is the clustering cousin). One aggregate
    for the edge array (broadcast back), one combinable groupBy."""
    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    ps = ", ".join(str(i / bins) for i in range(1, bins))
    edges = orders.agg(
        F.expr(f"percentile(o_totalprice, array({ps}))").alias("edges")
    )
    binned = orders.crossJoin(F.broadcast(edges)).select(
        F.size(
            F.filter("edges", lambda e: F.col("o_totalprice") > e)
        ).alias("bin"),
        "edges",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.when(
                    F.col("bin") > 0, F.element_at(F.first("edges"), F.col("bin"))
                ),
                6,
            ).alias("lo_edge"),
        )
        .orderBy("bin")
    )


PAGERANK_D = 0.85
PAGERANK_ITERS = 3
PAGERANK_TOP_K = 20


def part_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled power iterations, damping 0.85) over the
    undirected co-order part graph — the iterative-algorithm shape on
    Spark: each iteration is one join + one aggregate, the rank vector
    never leaves the cluster. Determinism: neighbor contributions are
    rounded to 12dp and summed as DECIMAL (order-free — a raw double sum
    across neighbors would be partition-order-dependent); the oracle
    unrolls the same three iterations as CTEs (the MMR precedent).
    Convergence is not the point at 3 iterations — identical arithmetic
    is."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )
    edges = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    n_nodes = deg.count()
    base = (1.0 - PAGERANK_D) / float(n_nodes)
    rank = deg.select("src", F.lit(1.0 / float(n_nodes)).alias("r"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(rank, "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.lit(PAGERANK_D) * F.col("r") / F.col("deg").cast("double"),
                    12,
                )
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        rank = (
            contrib.groupBy("node")
            .agg((F.lit(base) + F.sum("c").cast("double")).alias("r"))
            .select(F.col("node").alias("src"), "r")
        )
    from pyspark.sql.window import Window

    scored = rank.select(
        F.col("src").alias("part"), F.round("r", 6).alias("pagerank")
    )
    w = Window.orderBy(F.col("pagerank").desc(), F.col("part").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PAGERANK_TOP_K)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Batch 44: warehouse pack 2 — the remaining TPC-H query shapes expressible
# over the available columns (no partsupp table; no l_shipmode/receiptdate).
# Reference analogue: SURVEY.md §2.4-2.5 join+aggregate report families.

SHIP_SEGMENT = "BUILDING"
SHIP_CUTOFF = "1998-06-01"
SHIP_TOP_K = 10
FORECAST_WINDOW = ("1996-01-01", "1997-01-01")
FORECAST_DISCOUNT = (0.05, 0.07)
FORECAST_MAX_QTY = 24
VOLUME_NATIONS = ("NATION_2", "NATION_7")
VOLUME_SHIP_WINDOW = ("1996-01-01", "1998-01-01")
SHARE_REGION = "ASIA"
SHARE_NATION = "NATION_2"
SHARE_TYPE = "STANDARD"
SHARE_WINDOW = ("1996-01-01", "1998-01-01")
HIST_EXCLUDE_PRIORITY = "1-URGENT"
PROMO_WINDOW = ("1996-03-01", "1996-04-01")
SMALLQTY_BRAND = "Brand#11"
SMALLQTY_FRACTION = 0.2
DISJUNCT_CLAUSES = (
    ("Brand#12", 1, 11, 1, 5),
    ("Brand#2", 10, 20, 1, 10),
    ("Brand#3", 20, 30, 1, 15),
)
DORMANT_SEGMENTS = ("AUTOMOBILE", "HOUSEHOLD", "MACHINERY")
DORMANT_CUTOFF = "2001-01-01"


def _rev4():
    """extendedprice*(1-discount) rounded at its exact 4-dp scale, as
    DECIMAL for order-free summation (2dp x 2dp product is exact 4dp)."""
    return (
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
        .cast("decimal(28,4)")
        .alias("rev")
    )


def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped-order revenue for one market segment.
    Orders placed before the cutoff whose lines ship after it; revenue
    aggregated at order grain. Plan: both date filters push to the scans,
    customer-segment dim broadcasts into orders, the lineitem join runs
    key-partitioned on orderkey, top-k is an exact-DECIMAL rank."""
    from pyspark.sql.window import Window

    cut = F.lit(SHIP_CUTOFF).cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == SHIP_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cut)
        .select("l_orderkey", _rev4())
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum("rev").alias("revenue"))
    )
    # limit(k) BEFORE the window: TakeOrderedAndProject per-partition heaps,
    # then the rank window sorts only the k survivors (never a
    # single-partition sort of every qualifying order)
    order = (F.col("revenue").desc(), F.col("o_orderkey").asc())
    w = Window.orderBy(*order)
    return (
        agg.orderBy(*order)
        .limit(SHIP_TOP_K)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
            "rank",
        )
        .orderBy("rank")
    )


def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown aggregate — revenue
    delta from discounts in a band, small quantities, one ship year. No
    joins, no shuffle beyond the single-row final aggregate; the plan is
    one parquet scan with all three predicates in PushedFilters. The
    discount band compares stored 2-dp doubles against the same literals
    in both engines. rev = ep*discount is exact at 4dp."""
    lo, hi = FORECAST_WINDOW
    dlo, dhi = FORECAST_DISCOUNT
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        & (F.col("l_discount") >= dlo)
        & (F.col("l_discount") <= dhi)
        & (F.col("l_quantity") < FORECAST_MAX_QTY)
    )
    return li.agg(
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).cast(
                    "decimal(28,4)"
                )
            ).cast("double"),
            4,
        ).alias("revenue_delta"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def volume_shipping_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — supplier in one nation, ordering customer in the other, both
    directions. The two nation dims broadcast into supplier and (via
    orders) customer; the lineitem-orders join is the only fact-fact
    shuffle. Group keys (supp_nation, cust_nation, year) are tiny."""
    lo, hi = VOLUME_SHIP_WINDOW
    na, nb = VOLUME_NATIONS
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(na, nb)
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("nk2"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("nk2"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    j = (
        li.select("l_orderkey", "l_suppkey", F.year("l_shipdate").alias("ship_year"), _rev4())
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.round(F.sum("rev").cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier share of a region's imports
    of one part type, per order year. share = nation revenue / total
    revenue from exact DECIMAL sums (conditional numerator via CASE
    inside the same aggregate — one pass, no second join)."""
    lo, hi = SHARE_WINDOW
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == SHARE_REGION)
    rnation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(rnation.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == SHARE_TYPE)
        .select("p_partkey")
    )
    snation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(snation), F.col("s_nationkey") == F.col("snk"))
        .select("s_suppkey", "supp_nation")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev4()
    )
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("order_year")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    agg = j.groupBy("order_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == SHARE_NATION, F.col("rev")).otherwise(
                F.lit(0).cast("decimal(28,4)")
            )
        ).alias("nation_rev"),
        F.sum("rev").alias("total_rev"),
    )
    return agg.select(
        "order_year",
        F.round(F.col("nation_rev").cast("double"), 4).alias("nation_rev"),
        F.round(F.col("total_rev").cast("double"), 4).alias("total_rev"),
        F.round(
            F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"), 6
        ).alias("mkt_share"),
    ).orderBy("order_year")


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, orders
    filtered by a predicate (non-urgent priority stands in for the
    comment NOT LIKE). LEFT join keeps zero-order customers; two cheap
    aggregates (customer grain, then count grain)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != HIST_EXCLUDE_PRIORITY)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from promo parts.
    Part-type dim broadcasts; numerator is a CASE inside the single
    aggregate over exact DECIMAL revenue."""
    lo, hi = PROMO_WINDOW
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.select("l_partkey", _rev4()).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                F.lit(0).cast("decimal(28,4)")
            )
        ).alias("promo_rev"),
        F.sum("rev").alias("total_rev"),
    )
    return agg.select(
        F.round(F.col("promo_rev").cast("double"), 4).alias("promo_rev"),
        F.round(F.col("total_rev").cast("double"), 4).alias("total_rev"),
        F.round(
            F.lit(100.0)
            * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double"),
            6,
        ).alias("promo_pct"),
    )


def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems of one brand whose quantity
    sits below a fraction of that part's average quantity. The correlated
    scalar subquery becomes a per-part aggregate joined back — computed
    BEFORE the brand filter narrows it (the per-part average is over all
    lines of that part, matching Q17 semantics). Quantities are integral
    doubles, so avg = BIGINT sum / count is engine-identical; the 0.2×
    threshold compare is a single float product both sides."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == SMALLQTY_BRAND)
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_qty = brand_li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    j = brand_li.join(F.broadcast(avg_qty.withColumnRenamed("l_partkey", "pk")),
                      F.col("l_partkey") == F.col("pk")).filter(
        F.col("l_quantity") < F.lit(SMALLQTY_FRACTION) * F.col("avg_qty")
    )
    return j.agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice"), 2).cast("decimal(28,2)")).cast(
                "double"
            )
            / 7.0,
            4,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, quantity
    band, size band) conjunctions — the disjunctive-pushdown stress
    query. One broadcast join part->lineitem, the OR evaluated as a
    single boolean expression so Catalyst can still prune columns."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", _rev4())
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = F.lit(False)
    for brand, qlo, qhi, slo, shi in DISJUNCT_CLAUSES:
        cond = cond | (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
        )
    return j.filter(cond).agg(
        F.round(F.sum("rev").cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers in selected segments
    with no recent orders (anti-join), vs the segment-set average
    balance. Every customer has SOME order in the testdata, so 'dormant'
    = no order since DORMANT_CUTOFF — the NOT EXISTS shape is identical.
    The average is an exact DECIMAL(2dp) sum / count; balances compare
    against it as doubles (same chain both engines)."""
    segs = list(DORMANT_SEGMENTS)
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(segs)
    )
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.round(F.col("c_acctbal"), 2).cast("decimal(28,2)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bal")
        )
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    dormant = (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.round(
                F.sum(F.round(F.col("c_acctbal"), 2).cast("decimal(28,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Batch 45 (relational side): audit statistics over order totals.

# Benford P(d) = log10(1 + 1/d), materialized as shared Python literals so
# both engines consume the SAME doubles (never each engine's log10 — the
# _PI_LIT rule).
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the classic fraud /
    data-quality screen. First digit extracted via BIGINT->string cast
    (engine-identical, no log10 on data); expected counts and chi2
    contributions use the shared literal P(d) table; contributions round
    at 12dp into DECIMAL so the chi2 total is order-free."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    tot = counts.agg(F.sum("observed").cast("long").alias("n"))
    p = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in BENFORD_P.items() for x in kv]
        ),
        F.col("digit"),
    )
    expected = F.col("n").cast("double") * p
    contrib = (
        (F.col("observed").cast("double") - expected)
        * (F.col("observed").cast("double") - expected)
        / expected
    )
    cells = counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(contrib, 6).alias("contrib"),
        F.round(contrib, 12).cast("decimal(28,12)").alias("c12"),
    )
    chi2 = cells.agg(F.round(F.sum("c12").cast("double"), 6).alias("chi2"))
    return (
        cells.crossJoin(F.broadcast(chi2))
        .select("digit", "observed", "expected", "contrib", "chi2")
        .orderBy("digit")
    )


HISTQ_BINS = 20
HISTQ_QS = (0.5, 0.9, 0.99)


def histogram_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-style histogram_quantile vs the exact quantile: fixed-
    width histogram over order totals (integer bucket counts), linear
    interpolation inside the target bucket, next to the exact type-7
    percentile. The scale path (histogram) is one combinable groupBy; the
    exact leg exists to report the approximation error. Bucket selection
    (cum_before < q*n <= cum) is a strict double compare on identical
    chains, so both engines pick the same bucket."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    stats = orders.agg(
        F.min("o_totalprice").alias("vmin"),
        F.max("o_totalprice").alias("vmax"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "percentile(o_totalprice, array("
            + ", ".join(str(q) for q in HISTQ_QS)
            + "))"
        ).alias("exact_qs"),
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(HISTQ_BINS))
    binned = (
        orders.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("vmin")) / width).cast("int"),
                F.lit(HISTQ_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin", "c", (F.sum("c").over(w) - F.col("c")).alias("cum_before"),
        F.sum("c").over(w).alias("cum")
    )
    qs = spark.createDataFrame(
        [(i, float(q)) for i, q in enumerate(HISTQ_QS)], "qi int, q double"
    )
    j = cum.crossJoin(F.broadcast(qs)).crossJoin(F.broadcast(stats))
    target = F.col("q") * F.col("n").cast("double")
    hit = j.filter(
        (F.col("cum_before").cast("double") < target)
        & (target <= F.col("cum").cast("double"))
    )
    approx = (
        F.col("vmin")
        + F.col("bin").cast("double") * width
        + width
        * (target - F.col("cum_before").cast("double"))
        / F.col("c").cast("double")
    )
    exact = F.element_at(F.col("exact_qs"), F.col("qi") + 1)
    return hit.select(
        F.col("q"),
        F.col("bin"),
        F.round(approx, 6).alias("approx_q"),
        F.round(exact, 6).alias("exact_q"),
        F.round(F.abs(approx - exact), 6).alias("abs_err"),
    ).orderBy("q")


# ---------------------------------------------------------------------------
# Batch 47: warehouse pack 3 — the last TPC-H query shapes (Q2, Q9, Q11,
# Q12, Q15, Q16, Q20, Q21), completing all 22. No partsupp table exists in
# the testdata, so lineitem's (l_partkey, l_suppkey) pairs serve as the
# supply relation wherever TPC-H reads partsupp: unit cost is the minimum
# observed round(extendedprice/quantity, 6) for the pair, availability is
# the pair's shipped-quantity total. Reference analogue: SURVEY.md §2.4-2.5
# join+aggregate report families (XdiReportReducer join-then-count loops).

MINCOST_REGION = "EUROPE"
MINCOST_TYPE = "STANDARD"
MINCOST_MIN_SIZE = 40
MINCOST_TOP_K = 100
PROFIT_NAME_SUBSTR = "red"
PROFIT_COST_FACTOR = 0.6  # supplycost stand-in = 0.6 * p_retailprice
IMPORTANT_NATION = "NATION_3"
IMPORTANT_SHARE_MULT = 2  # keep parts above 2x the mean part share
LATE_PRIORITY_HIGH = ("1-URGENT", "2-HIGH")
LATE_WINDOW = ("1997-01-01", "1998-01-01")
TOP_SUPPLIER_QUARTER = ("1997-01-01", "1997-04-01")
SUPPCNT_EXCL_BRAND = "Brand#4"
SUPPCNT_EXCL_TYPE = "PROMO"
PROMOTION_NAME_PREFIX = "small"
PROMOTION_WINDOW = ("1997-01-01", "1998-01-01")
PROMOTION_MIN_QTY = 50
WAITING_LATE_DAYS = 60
WAITING_STATUS = "F"
WAITING_TOP_K = 20


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region supplier with
    the minimum unit cost (correlated-min subquery). Unit cost per
    (part, supplier) = min round(extendedprice/quantity, 6) over their
    lineitems — the float division is a single IEEE op both engines
    compute identically, and min is order-free. Plan: the part and
    supplier dims broadcast into the (part,supp) aggregate; the
    correlated min is a per-part window (no self-join); top-k is an
    exact rank with a full tie-break chain."""
    from pyspark.sql.window import Window

    nations = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(
                    F.col("r_name") == MINCOST_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == MINCOST_TYPE)
            & (F.col("p_size") >= MINCOST_MIN_SIZE)
        )
        .select("p_partkey", "p_name")
    )
    cost = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias(
                "unit_cost"
            ),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_cost").alias("cost"))
    )
    j = (
        cost.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    wmin = Window.partitionBy("p_partkey")
    best = j.withColumn("min_cost", F.min("cost").over(wmin)).filter(
        F.col("cost") == F.col("min_cost")
    )
    w = Window.orderBy(
        F.col("s_acctbal").desc(),
        F.col("n_name").asc(),
        F.col("s_name").asc(),
        F.col("p_partkey").asc(),
        F.col("s_suppkey").asc(),
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MINCOST_TOP_K)
        .select(
            "rank",
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("cost"), 6).alias("unit_cost"),
        )
        .orderBy("rank")
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    whose name contains a substring. Profit per line = revenue minus a
    supply-cost stand-in (0.6 * p_retailprice * quantity — retailprice is
    2dp so the cost is an exact 3dp decimal; revenue is exact 4dp; the
    difference rounds tie-free at 6dp into order-free DECIMAL sums).
    Plan: part-name filter broadcasts, supplier/nation broadcast, the
    orders join carries only (orderkey, year)."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PROFIT_NAME_SUBSTR))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("order_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(PROFIT_COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity"),
        6,
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "order_year")
        .agg(
            F.round(
                F.sum(profit.cast("decimal(28,6)")).cast("double"), 4
            ).alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy("nation", F.col("order_year").desc())
    )


def important_part_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value through one nation's suppliers
    exceeds a threshold of that nation's total (the HAVING-vs-global-
    scalar pattern). The spec's fixed fraction de-selects everything as
    the corpus grows, so the cutoff is 2x the MEAN part share — scale-
    free by construction. All money is exact integer cents
    (round(extendedprice*100) — 2dp doubles land within an ulp of the
    integer), so the comparison value*n_parts > mult*total is pure
    integer arithmetic with no float boundary. Plan: the national
    supplier dim broadcasts; the global total is a one-row broadcast
    cross join, not a driver collect."""
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(
                    F.col("n_name") == IMPORTANT_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100.0, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("cents").alias("value_cents"))
    total = per_part.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.col("n_parts")
            > F.col("total_cents") * F.lit(IMPORTANT_SHARE_MULT)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_cents").cast("double") / 100.0, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


def late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting after a fact-fact join —
    late-shipping lines (shipdate > orderdate + 60 days) in one ship
    year, bucketed by returnflag with high-priority vs low-priority
    CASE counts (no l_shipmode column; returnflag is the line-grain
    categorical). Integer counts only; both date filters push down."""
    lo, hi = LATE_WINDOW
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin(list(LATE_PRIORITY_HIGH))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {WAITING_LATE_DAYS} DAYS"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter — the view-then-max-subquery pattern as a window max over
    exact DECIMAL(28,4) sums (ties all kept, like the spec). Plan: one
    filtered lineitem scan, per-supplier partial aggregate, 100-row
    window; supplier dim broadcasts into the winners only."""
    from pyspark.sql.window import Window

    lo, hi = TOP_SUPPLIER_QUARTER
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .select("l_suppkey", _rev4())
        .groupBy("l_suppkey")
        .agg(F.sum("rev").alias("total_rev"))
    )
    best = rev.withColumn(
        "max_rev", F.max("total_rev").over(Window.partitionBy())
    ).filter(F.col("total_rev") == F.col("max_rev"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type) for
    parts outside an excluded brand/type, excluding flagged suppliers
    (NOT IN → anti-join; negative account balance is the complaint
    stand-in). Supply pairs come from lineitem distinct (part, supp).
    Plan: dims broadcast, one distinct + one countDistinct shuffle."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != SUPPCNT_EXCL_BRAND)
            & (F.col("p_type") != SUPPCNT_EXCL_TYPE)
        )
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
        )
    )


def promotion_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding significant stock of promotion
    parts — two nested semi-joins (supplier ← exists (part,supp) pair ←
    part-name filter) with a correlated quantity aggregate. Availability
    stand-in: the pair's shipped quantity in the window must exceed a
    floor. Integer quantity sums; the name-filtered part dim broadcasts
    into the pair aggregate."""
    lo, hi = PROMOTION_WINDOW
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(PROMOTION_NAME_PREFIX))
        .select("p_partkey")
    )
    qual_pairs = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > PROMOTION_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(qual_pairs, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finalized order (exists + not-exists pair). Rewritten
    shuffle-once: per (order, supplier) late flags, then per-order
    distinct-supplier and late-supplier counts via a window — a supplier
    qualifies when they are late, the order has >1 supplier, and exactly
    one supplier is late. Late = shipdate > orderdate + 60 days."""
    from pyspark.sql.window import Window

    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == WAITING_STATUS)
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {WAITING_LATE_DAYS} DAYS")
    ).cast("int")
    per_pair = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late", late)
        .groupBy("o_orderkey", "l_suppkey")
        .agg(F.max("late").alias("supp_late"))
    )
    w = Window.partitionBy("o_orderkey")
    flagged = per_pair.select(
        "o_orderkey",
        "l_suppkey",
        "supp_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("supp_late").over(w).alias("n_late_supp"),
    )
    qual = flagged.filter(
        (F.col("supp_late") == 1)
        & (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    counts = (
        qual.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    wr = Window.orderBy(F.col("numwait").desc(), F.col("s_name").asc())
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= WAITING_TOP_K)
        .select("rank", "s_name", "numwait")
        .orderBy("rank")
    )


ITEM_COSINE_TOP_K = 20


def item_cosine_similarity(
    spark: SparkSession, sf_dir: str, k: int = ITEM_COSINE_TOP_K
) -> DataFrame:
    """Item-item cosine similarity over order co-occurrence — the
    neighborhood-model recsys primitive next to part_affinity_lift's
    lift view: sim(a, b) = n_ab / sqrt(n_a · n_b) on distinct
    (order, part) pairs, support cut at AFFINITY_MIN_SUPPORT co-orders
    BEFORE the pair join prunes the tail. Counts are exact integers;
    the cosine is one fixed IEEE expression; ranks on the ROUNDED
    score (pa, pb ties). Same self-join shape as the affinity ops —
    order-key co-location, never all-pairs."""
    from lucene_mapreduce_spark.operators.parity import load, ranked_topk

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
    )
    deg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        co.join(deg.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na")), "pa")
        .join(deg.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb")), "pb")
        .select(
            "pa",
            "pb",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    return ranked_topk(
        scored, [F.desc("cosine"), F.asc("pa"), F.asc("pb")], k
    ).select("pa", "pb", "n_ab", "cosine", "rank")


# --- batch 76: graph pack over the co-order part graph ---------------------
KCORE_K = 3
KCORE_ROUNDS = 3
LPA_ITERS = 2


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-order part graph shared by affinity_triangles /
    kcore_peel_rounds / label_propagation_parts: undirected edges
    (pa < pb) between parts co-ordered in >= AFFINITY_MIN_SUPPORT
    orders. Basket-bounded self-join, support-pruned before anything
    downstream touches it."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )


def kcore_peel_rounds(
    spark: SparkSession,
    sf_dir: str,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
) -> DataFrame:
    """k-core decomposition by synchronous peeling (the distributed
    k-core recipe: each round drops every node with degree < k in the
    CURRENT induced subgraph, recomputes degrees, repeats). Bounded
    unroll of KCORE_ROUNDS rounds — the same bounded-iteration
    discipline as part_pagerank_3iter / near_dup_components. Each
    round is one degree groupBy plus two semi-joins; the edge set is
    localCheckpoint()ed per round so lineage stays flat at scale.
    Isolated survivors (degree 0 after a removal wave) count as
    removed in the NEXT round, matching the degree-table semantics in
    both engines. All integers."""
    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    prev_n = deg.agg(F.count(F.lit(1)).cast("long").alias("n_before"))
    out = None
    cur = edges
    for r in range(1, rounds + 1):
        deg_r = (
            cur.select(F.col("pa").alias("node"))
            .unionAll(cur.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        surv = deg_r.filter(F.col("d") >= k).select("node")
        cur = (
            cur.join(surv, cur.pa == surv.node, "left_semi")
            .join(surv, F.col("pb") == surv.node, "left_semi")
            .localCheckpoint()
        )
        n_surv = surv.agg(
            F.count(F.lit(1)).cast("long").alias("n_survivors")
        )
        n_edges = cur.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        row = (
            prev_n.crossJoin(n_surv)
            .crossJoin(n_edges)
            .select(
                F.lit(r).cast("int").alias("round"),
                (F.col("n_before") - F.col("n_survivors"))
                .cast("long")
                .alias("n_removed"),
                "n_survivors",
                "n_edges",
            )
        )
        out = row if out is None else out.unionByName(row)
        prev_n = n_surv.select(F.col("n_survivors").alias("n_before"))
    return out.orderBy("round")


def label_propagation_parts(
    spark: SparkSession, sf_dir: str, iters: int = LPA_ITERS
) -> DataFrame:
    """Synchronous label propagation (community detection) over the
    co-order part graph, LPA_ITERS unrolled iterations. Initial label
    = p_brand; each iteration every node takes the most frequent label
    among its neighbors' PREVIOUS labels, ties broken by minimum label
    (the deterministic-LPA convention — raw LPA's random tie-break is
    not reproducible). Per iteration: one adjacency join + one
    (node,label) count groupBy + one WindowGroupLimit argmax — the
    standard Pregel-as-joins shape. Every graph node has >= 1 edge so
    no keep-own-label branch is needed."""
    from pyspark.sql.window import Window

    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        edges.select(F.col("pa").alias("node"))
        .union(edges.select(F.col("pb").alias("node")))
        .distinct()
    )
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("lbl")
    )
    labels = [nodes.join(F.broadcast(part), "node").select("node", "lbl")]
    adj = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    for _ in range(iters):
        prev = labels[-1]
        cnt = (
            adj.join(
                prev.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("cnt"), F.asc("lbl")
        )
        nxt = (
            cnt.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("node", "lbl")
            .localCheckpoint()
        )
        labels.append(nxt)
    out = labels[0].select(
        F.col("node").alias("p_partkey"), F.col("lbl").alias("label_init")
    )
    for i, li_df in enumerate(labels[1:], start=1):
        out = out.join(
            li_df.select(
                F.col("node").alias("p_partkey"),
                F.col("lbl").alias(f"label_{i}"),
            ),
            "p_partkey",
        )
    return out.orderBy("p_partkey")


# --- batch 77: lakehouse layout planning + robust trend ---------------------
ZORDER_N_FILES = 64
ZORDER_X_BUCKETS = 16
ZORDER_Y_BUCKETS = 16
ZORDER_PRED_BUCKET = 4  # the probe range = bucket 4 of each dim
SKIP_N_FILES = 64
SKIP_PRED_DATES = ("1998-01-01", "1998-03-31")


def _z_expr(bx: str, by: str, divop: str) -> str:
    """4+4-bit Morton interleave as pure integer div/mod arithmetic —
    no shift operators, so the identical formula runs in Spark SQL
    (`div`) and DuckDB (`//`). x bits land on odd positions."""
    terms = []
    for i in range(4):
        terms.append(f"((({bx}) {divop} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({by}) {divop} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_layout_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER file-clustering plan (Delta/Iceberg OPTIMIZE ZORDER BY):
    lineitem rows are laid into ZORDER_N_FILES files under (a) the
    linear lexicographic sort (l_partkey, l_suppkey) and (b) the
    Morton z-order of the two keys' 16-level buckets; for a range
    predicate on EACH dim (bucket ZORDER_PRED_BUCKET of that dim's
    key space — derived from max(key)+1 by exact integer arithmetic so
    the plan is scale-free) the report counts the files a min/max
    footer index lets the scan skip. The point the numbers make:
    linear prunes only its leading key, z-order prunes both. File
    assignment is an ntile over the total sort order (exact,
    oracle-matchable; the row-count single-partition window is bounded
    at test scale — the production path is repartitionByRange on the
    same z key, the identical discipline at any scale). All integers
    except the final read-amplification ratio."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    mrow = li.agg(
        F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my")
    ).collect()[0]
    nx, ny = int(mrow["mx"]) + 1, int(mrow["my"]) + 1
    bx = f"(l_partkey * {ZORDER_X_BUCKETS}) div {nx}"
    by = f"(l_suppkey * {ZORDER_Y_BUCKETS}) div {ny}"
    li = li.withColumn("z", F.expr(_z_expr(bx, by, "div")))
    pb = ZORDER_PRED_BUCKET
    preds = {
        "x_range": (
            "l_partkey",
            nx * pb // ZORDER_X_BUCKETS,
            nx * (pb + 1) // ZORDER_X_BUCKETS - 1,
        ),
        "y_range": (
            "l_suppkey",
            ny * pb // ZORDER_Y_BUCKETS,
            ny * (pb + 1) // ZORDER_Y_BUCKETS - 1,
        ),
    }
    layouts = {
        "linear": Window.orderBy(
            "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
        ),
        "zorder": Window.orderBy(
            "z", "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
        ),
    }
    matched = li.agg(
        *[
            F.sum(F.col(c).between(lo, hi).cast("int"))
            .cast("long")
            .alias(f"m_{p}")
            for p, (c, lo, hi) in preds.items()
        ]
    )
    out = None
    for lname, w in layouts.items():
        files = (
            li.select(
                F.ntile(ZORDER_N_FILES).over(w).alias("f"),
                "l_partkey",
                "l_suppkey",
            )
            .groupBy("f")
            .agg(
                F.min("l_partkey").alias("min_x"),
                F.max("l_partkey").alias("max_x"),
                F.min("l_suppkey").alias("min_y"),
                F.max("l_suppkey").alias("max_y"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )
        for pname, (col, lo, hi) in preds.items():
            mn, mx = ("min_x", "max_x") if col == "l_partkey" else (
                "min_y",
                "max_y",
            )
            hit = (F.col(mn) <= hi) & (F.col(mx) >= lo)
            row = (
                files.agg(
                    F.count(F.lit(1)).cast("long").alias("n_files"),
                    F.sum(hit.cast("int")).cast("long").alias("files_read"),
                    F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
                    .cast("long")
                    .alias("rows_scanned"),
                )
                .crossJoin(F.broadcast(matched))
                .select(
                    F.lit(lname).alias("layout"),
                    F.lit(pname).alias("predicate"),
                    "n_files",
                    "files_read",
                    (F.col("n_files") - F.col("files_read"))
                    .cast("long")
                    .alias("files_skipped"),
                    F.col(f"m_{pname}").alias("rows_matched"),
                    "rows_scanned",
                    F.round(
                        F.col("rows_scanned").cast("double")
                        / F.col(f"m_{pname}").cast("double"),
                        6,
                    ).alias("read_amplification"),
                )
            )
            out = row if out is None else out.unionByName(row)
    return out.orderBy("layout", "predicate")


def file_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max footer-pruning audit (the parquet row-group / Iceberg
    manifest skip story): orders land in SKIP_N_FILES files under (a)
    arrival order (o_orderkey) and (b) a date-clustered rewrite; a
    pinned quarter-long date-range predicate then reads only the files
    whose [min,max] orderdate straddles it. Companion to
    zorder_layout_plan for the single-dim case — the number that
    justifies clustering-on-write at 100 TB. All integer plus one
    ratio."""
    from pyspark.sql.window import Window

    lo_us, hi_us = [
        int(
            __import__("datetime")
            .datetime.strptime(d, "%Y-%m-%d")
            .replace(tzinfo=__import__("datetime").timezone.utc)
            .timestamp()
        )
        * 1_000_000
        for d in SKIP_PRED_DATES
    ]
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("d_us"),
    )
    pred = F.col("d_us").between(lo_us, hi_us)
    matched = orders.agg(
        F.sum(pred.cast("int")).cast("long").alias("rows_matched")
    )
    layouts = {
        "arrival": Window.orderBy("o_orderkey"),
        "date_sorted": Window.orderBy("d_us", "o_orderkey"),
    }
    out = None
    for lname, w in layouts.items():
        files = (
            orders.select(
                F.ntile(SKIP_N_FILES).over(w).alias("f"), "d_us"
            )
            .groupBy("f")
            .agg(
                F.min("d_us").alias("mn"),
                F.max("d_us").alias("mx"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )
        hit = (F.col("mn") <= hi_us) & (F.col("mx") >= lo_us)
        row = (
            files.agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(hit.cast("int")).cast("long").alias("files_read"),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
                .cast("long")
                .alias("rows_scanned"),
            )
            .crossJoin(F.broadcast(matched))
            .select(
                F.lit(lname).alias("layout"),
                "n_files",
                "files_read",
                (F.col("n_files") - F.col("files_read"))
                .cast("long")
                .alias("files_skipped"),
                "rows_matched",
                "rows_scanned",
                F.round(
                    F.col("rows_scanned").cast("double")
                    / F.col("rows_matched").cast("double"),
                    6,
                ).alias("read_amplification"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("layout")


def theil_sen_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of weekly order revenue: the median of
    all pairwise slopes (y_j - y_i)/(w_j - w_i), plus the matching
    median-residual intercept — the outlier-proof sibling of
    ols_token_chars_fit / mann_kendall_trend. Weekly revenue is an
    exact DECIMAL(18,2) sum cast to double; each pairwise slope is one
    IEEE division of identical operands, 6dp-rounded BEFORE the median
    so both engines rank identical values (percentile() == DuckDB
    quantile_cont, type-7). Weeks are epoch-day div 7 (never engine
    week-truncation). The pair join is week-count bounded (~n^2/2 of a
    few hundred rows), never row-count bounded."""
    orders = load(spark, sf_dir, "orders").select(
        F.expr(
            "(unix_micros(cast(o_orderdate as timestamp))"
            " div 86400000000) div 7"
        ).alias("wk"),
        F.round(F.col("o_totalprice"), 2)
        .cast("decimal(18,2)")
        .alias("tp"),
    )
    weekly = orders.groupBy("wk").agg(
        F.sum("tp").cast("double").alias("rev")
    )
    a = weekly.select(
        F.col("wk").alias("w1"), F.col("rev").alias("r1")
    )
    b = weekly.select(
        F.col("wk").alias("w2"), F.col("rev").alias("r2")
    )
    pairs = a.join(b, F.col("w1") < F.col("w2")).select(
        F.round(
            (F.col("r2") - F.col("r1"))
            / (F.col("w2") - F.col("w1")).cast("double"),
            6,
        ).alias("slope")
    )
    sen = pairs.agg(
        F.expr("percentile(slope, 0.5)").alias("sen_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = weekly.crossJoin(F.broadcast(sen)).select(
        "n_pairs",
        "sen_slope",
        F.round(
            F.col("rev") - F.col("sen_slope") * F.col("wk").cast("double"),
            6,
        ).alias("resid"),
    )
    return resid.groupBy("n_pairs", "sen_slope").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.expr("percentile(resid, 0.5)").alias("intercept"),
    ).select(
        "n_weeks",
        "n_pairs",
        F.round("sen_slope", 6).alias("sen_slope"),
        F.round("intercept", 6).alias("intercept"),
    )


# --- batch 83: storage encodability + graph centrality + order dedup --------
def harmonic_centrality_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop-truncated harmonic centrality over the co-order part graph:
    C(v) = |N1(v)| + |N2(v)|/2, with N2 the nodes at distance exactly 2
    (neighbors-of-neighbors minus N1 minus v). The standard bounded-BFS
    stand-in for full harmonic centrality at scale — one adjacency
    self-join bounded by degree, one distinct, two counts; top 20 by
    centrality (total order: score desc, node asc). Score is
    half-integral so it rides an exact 1dp double."""
    from pyspark.sql.window import Window  # noqa: F401 (parity w/ sibs)

    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    adj = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    deg = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n1")
    )
    two = (
        adj.alias("a")
        .join(
            adj.alias("b"), F.col("a.v") == F.col("b.u")
        )
        .select(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .join(
            adj.select(
                F.col("u").alias("u"), F.col("v").alias("w")
            ).withColumn("d1", F.lit(1)),
            ["u", "w"],
            "left",
        )
        .filter(F.col("d1").isNull())
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    cent = deg.join(two, "u", "left").select(
        F.col("u").alias("p_partkey"),
        "n1",
        F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
        (
            F.col("n1").cast("double")
            + F.coalesce("n2", F.lit(0)).cast("double") / F.lit(2.0)
        ).alias("centrality"),
    )
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    return ranked_topk(
        cent, [F.desc("centrality"), F.asc("p_partkey")], 20
    ).select("p_partkey", "n1", "n2", "centrality", "rank")


DUP_ORDER_WINDOW_D = 7
DUP_ORDER_PRICE_BAND = 5000  # dollars; exact DECIMAL band


def duplicate_order_detection(
    spark: SparkSession,
    sf_dir: str,
    window_d: int = DUP_ORDER_WINDOW_D,
    band: int = DUP_ORDER_PRICE_BAND,
) -> DataFrame:
    """Duplicate-transaction detection (the fintech dedup shape): order
    pairs from the SAME customer within window_d days whose 2dp totals
    differ by at most DUP_ORDER_PRICE_BAND — the candidate set a
    chargeback/double-billing review walks. Blocking on the customer
    key makes the self-join orders-per-customer-bounded (never
    all-pairs), the entity-resolution blocking discipline; the band
    and gap tests are exact DECIMAL/integer filters after the
    equi-join. Oriented a < b by orderkey."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2)
        .cast("decimal(18,2)")
        .alias("tp"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("day"),
    )
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("ok_a"),
        F.col("tp").alias("tp_a"),
        F.col("day").alias("day_a"),
    )
    b = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("ok_b"),
        F.col("tp").alias("tp_b"),
        F.col("day").alias("day_b"),
    )
    pairs = (
        a.join(b, "o_custkey")
        .filter(F.col("ok_a") < F.col("ok_b"))
        .filter(F.abs(F.col("day_a") - F.col("day_b")) <= F.lit(window_d))
        .filter(
            F.abs(F.col("tp_a") - F.col("tp_b"))
            <= F.lit(band).cast("decimal(18,2)")
        )
    )
    return pairs.select(
        "o_custkey",
        "ok_a",
        "ok_b",
        F.col("tp_a").cast("double").alias("price_a"),
        F.col("tp_b").cast("double").alias("price_b"),
        F.abs(F.col("tp_a") - F.col("tp_b"))
        .cast("double")
        .alias("price_diff"),
        F.abs(F.col("day_a") - F.col("day_b"))
        .cast("long")
        .alias("day_gap"),
    ).orderBy("o_custkey", "ok_a", "ok_b")


def rle_encodability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encodability audit for the documents.lang column —
    the storage-layout twin of file_skipping_audit: under (a) arrival
    order (doc_id) and (b) a lang-clustered rewrite, count the RLE runs
    a dictionary+RLE column encoder would emit. Clustering collapses
    runs to ~cardinality, the reason OPTIMIZE-then-encode shrinks cold
    columns. Runs counted with one lag-window pass per layout (window
    over the corpus: bounded at test scale; the production measurement
    samples per file, same plan per file). All integers plus one
    ratio."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = None
    for lname, order in (
        ("arrival", [F.asc("doc_id")]),
        ("lang_clustered", [F.asc("lang"), F.asc("doc_id")]),
    ):
        w = Window.orderBy(*order)
        runs = docs.select(
            F.when(
                F.lag("lang").over(w).isNull()
                | (F.lag("lang").over(w) != F.col("lang")),
                1,
            )
            .otherwise(0)
            .alias("brk")
        )
        row = runs.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("brk").cast("long").alias("n_runs"),
        ).select(
            F.lit(lname).alias("layout"),
            "n_rows",
            "n_runs",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("n_runs").cast("double"),
                6,
            ).alias("avg_run_len"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("layout")


BLOOM_FILES = 64
BLOOM_BITS = 63  # bits 0..62 of a BIGINT mask; sign bit untouched
BLOOM_PROBE_STRIDE = 1009  # probe keys k*stride, half beyond the keyspace
BLOOM_N_PROBES = 30


def bloom_file_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bloom-filter file skipping for point lookups (the parquet
    bloom_filter / Iceberg bloom story, complement of the min/max
    audit): orders hash-place into BLOOM_FILES files (hashed placement
    defeats min/max pruning entirely — every file spans the whole key
    range — so blooms are the ONLY skipper), each file folds a 63-bit
    bloom mask (two md5 hash functions per key, bit_or aggregate —
    mergeable, footer-sized), and a pinned probe ladder (stride
    BLOOM_PROBE_STRIDE, half the probes beyond the keyspace) counts
    files passing each probe vs the one file that can truly contain
    it. false_positives = passes - exists: the number a capacity plan
    reads to size bits-per-key. All integer/md5."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")

    def h(col, salt: str, mod: int):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(col.cast("string"), F.lit(f":{salt}"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(mod),
        )

    # masks via expr columns (shiftleft needs F.expr — the hll rule)
    keyed = o.select(
        "o_orderkey",
        h(F.col("o_orderkey"), "file", BLOOM_FILES).alias("f"),
        h(F.col("o_orderkey"), "b1", BLOOM_BITS).alias("h1"),
        h(F.col("o_orderkey"), "b2", BLOOM_BITS).alias("h2"),
    ).select(
        "o_orderkey",
        "f",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(h1 AS INT))"
            " | shiftleft(CAST(1 AS BIGINT), CAST(h2 AS INT))"
        ).alias("m"),
    )
    files = keyed.groupBy("f").agg(F.expr("bit_or(m)").alias("fmask"))
    probes = spark.createDataFrame(
        [(k * BLOOM_PROBE_STRIDE,) for k in range(BLOOM_N_PROBES)],
        "probe_key long",
    )
    pk = probes.select(
        "probe_key",
        h(F.col("probe_key"), "b1", BLOOM_BITS).alias("h1"),
        h(F.col("probe_key"), "b2", BLOOM_BITS).alias("h2"),
    ).select(
        "probe_key",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(h1 AS INT))"
            " | shiftleft(CAST(1 AS BIGINT), CAST(h2 AS INT))"
        ).alias("kmask"),
    )
    passes = (
        pk.crossJoin(F.broadcast(files))
        .select(
            "probe_key",
            (
                F.expr("fmask & kmask") == F.col("kmask")
            ).cast("int").alias("pass"),
        )
        .groupBy("probe_key")
        .agg(F.sum("pass").cast("long").alias("files_pass"))
    )
    exists = o.select(F.col("o_orderkey").alias("probe_key")).distinct()
    out = (
        passes.join(
            exists.withColumn("ex", F.lit(1)), "probe_key", "left"
        )
        .select(
            "probe_key",
            F.coalesce("ex", F.lit(0)).cast("int").alias("key_exists"),
            "files_pass",
            (
                F.col("files_pass")
                - F.coalesce("ex", F.lit(0)).cast("long")
            )
            .cast("long")
            .alias("false_positives"),
        )
    )
    return out.orderBy("probe_key")


# --- batch 90: tuning advisor + revenue waterfall ----------------------------
ADVISOR_BROADCAST_BYTES = 10 * 1024 * 1024  # spark's default 10MB threshold
ADVISOR_PARTITION_BYTES = 128 * 1024 * 1024  # maxPartitionBytes default
ADVISOR_SLOTS = 32
ADVISOR_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
]


def spark_tuning_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/partition tuning advisor — the pre-flight a 100-TB plan
    review runs: per table an uncompressed-bytes estimate from typed
    column widths (8B per numeric/timestamp, length() per string,
    4B+4B per float-array element header-free approximation), the
    broadcast-vs-shuffle verdict against Spark's 10MB default, the
    scan partition count at 128MB maxPartitionBytes, and the task
    waves that partition count costs on ADVISOR_SLOTS slots. Estimates
    are EXACT integer sums (never sampled), so the advice is
    reproducible; the real cluster multiplies by its measured
    compression ratio — the advisor publishes the invariant part."""
    out = None
    for tbl in ADVISOR_TABLES:
        df = load(spark, sf_dir, tbl)
        width = None
        for f_ in df.schema.fields:
            t = f_.dataType.simpleString()
            if t == "string":
                w = F.coalesce(
                    F.length(F.col(f_.name)).cast("long"), F.lit(0)
                )
            elif t.startswith("array<float"):
                w = (
                    F.coalesce(
                        F.size(F.col(f_.name)).cast("long"), F.lit(0)
                    )
                    * 4
                )
            else:
                w = F.lit(8).cast("long")
            width = w if width is None else width + w
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(width).cast("long").alias("est_bytes"),
        ).select(
            F.lit(tbl).alias("tbl"),
            "n_rows",
            "est_bytes",
            (F.col("est_bytes") <= F.lit(ADVISOR_BROADCAST_BYTES))
            .cast("int")
            .alias("broadcastable"),
            F.greatest(
                F.lit(1),
                F.expr(
                    f"(est_bytes + {ADVISOR_PARTITION_BYTES - 1})"
                    f" div {ADVISOR_PARTITION_BYTES}"
                ),
            )
            .cast("long")
            .alias("scan_partitions"),
        ).select(
            "tbl",
            "n_rows",
            "est_bytes",
            "broadcastable",
            "scan_partitions",
            F.expr(
                f"(scan_partitions + {ADVISOR_SLOTS - 1})"
                f" div {ADVISOR_SLOTS}"
            )
            .cast("long")
            .alias("task_waves"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("tbl")


def revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue decomposition waterfall (TPC-H Q1's money columns as a
    report): gross extendedprice, discount given, net after discount,
    tax collected on net, and the final charge — each an exact
    DECIMAL sum of 4dp-rounded per-row amounts (the relational
    determinism rule), published as (component, amount) rows in
    waterfall order. One scan, one aggregate."""
    li = load(spark, sf_dir, "lineitem")

    def dsum(expr):
        return F.sum(F.round(expr, 4).cast("decimal(38,4)"))

    agg = li.agg(
        dsum(F.col("l_extendedprice")).alias("gross"),
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "discount"
        ),
        dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("net"),
        dsum(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * F.col("l_tax")
        ).alias("tax"),
        dsum(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("charge"),
    )
    rows = []
    for i, name in enumerate(
        ["1_gross", "2_discount", "3_net", "4_tax", "5_charge"]
    ):
        col = name.split("_", 1)[1]
        rows.append(
            agg.select(
                F.lit(name).alias("component"),
                F.round(F.col(col).cast("double"), 2).alias("amount"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("component")


# Pinned (column, kind) schemas feeding the advisor's DuckDB twin — must
# mirror the datagen parquet schema (kind: string | floatarr | fixed).
ADVISOR_SCHEMAS = {
    "region": [("r_regionkey", "fixed"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "fixed"), ("n_name", "string"),
        ("n_regionkey", "fixed"),
    ],
    "customer": [
        ("c_custkey", "fixed"), ("c_name", "string"),
        ("c_nationkey", "fixed"), ("c_acctbal", "fixed"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "fixed"), ("s_name", "string"),
        ("s_nationkey", "fixed"), ("s_acctbal", "fixed"),
    ],
    "part": [
        ("p_partkey", "fixed"), ("p_name", "string"),
        ("p_brand", "string"), ("p_type", "string"),
        ("p_size", "fixed"), ("p_retailprice", "fixed"),
    ],
    "orders": [
        ("o_orderkey", "fixed"), ("o_custkey", "fixed"),
        ("o_orderstatus", "string"), ("o_totalprice", "fixed"),
        ("o_orderdate", "fixed"), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "fixed"), ("l_partkey", "fixed"),
        ("l_suppkey", "fixed"), ("l_linenumber", "fixed"),
        ("l_quantity", "fixed"), ("l_extendedprice", "fixed"),
        ("l_discount", "fixed"), ("l_tax", "fixed"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "fixed"),
    ],
    "events": [
        ("event_id", "fixed"), ("ts", "fixed"), ("user_id", "fixed"),
        ("event_type", "string"), ("value", "fixed"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "fixed"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "fixed"),
    ],
}


# --- batch 93: delta-varint audit, AQE coalesce plan, systematic sample -----
def delta_varint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta + varint encoding audit for an integer key column
    (l_partkey) — the third leg of the encoding trilogy next to
    rle_encodability_audit and dict_encoding_audit: raw varint bytes in
    arrival order vs varint-of-deltas after a sort (parquet
    DELTA_BINARY_PACKED's win). varint size = max(1,
    ceil(bit_length(v)/7)), bit length INTEGER-ONLY via length(bin(v));
    sorted deltas are non-negative so no zigzag term. One window lag
    over the sorted view; exact integer byte totals."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )

    def vbytes_int(col):
        # integer ceil(bits/7); bits+6 <= 70 so the float floor is exact
        return (
            F.when(col <= 0, F.lit(1))
            .otherwise(F.floor((F.length(F.bin(col)) + 6) / 7))
            .cast("long")
        )

    raw = li.select(vbytes_int(F.col("v")).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("b").cast("long").alias("total_bytes"),
    )
    w = Window.orderBy("v", "l_orderkey", "l_linenumber")
    deltas = li.select(
        (F.col("v") - F.coalesce(F.lag("v").over(w), F.lit(0))).alias(
            "d"
        )
    )
    sortd = deltas.select(vbytes_int(F.col("d")).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("b").cast("long").alias("total_bytes"),
    )
    out = raw.select(
        F.lit("raw_varint").alias("layout"), "n_values", "total_bytes"
    ).unionByName(
        sortd.select(
            F.lit("delta_sorted_varint").alias("layout"),
            "n_values",
            "total_bytes",
        )
    )
    return out.select(
        "layout",
        "n_values",
        "total_bytes",
        F.round(
            F.col("total_bytes").cast("double")
            / F.col("n_values").cast("double"),
            6,
        ).alias("bytes_per_value"),
    ).orderBy("layout")


AQE_PARTITIONS = 32
AQE_TARGET_DIV = 8  # coalesce toward ~8 groups at any scale


def aqe_coalesce_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE partition-coalescing simulation
    (spark.sql.adaptive.coalescePartitions): events hash to
    AQE_PARTITIONS shuffle partitions via the engine-shared md5
    routing, and adjacent partitions greedily merge until each group
    reaches the scale-free target total/AQE_TARGET_DIV rows — exactly
    the post-shuffle stats walk AQE's coalescer performs. The greedy
    pass is a sequential fold over the partition-count-bounded array
    (32 elements, the CUSUM fold discipline); output one row per
    coalesced group. All integers."""
    ev = load(spark, sf_dir, "events").select(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(":aqe"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(AQE_PARTITIONS),
        ).alias("p")
    )
    counts = ev.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    packed = counts.agg(
        F.sort_array(F.collect_list(F.struct("p", "c"))).alias("ps"),
        F.sum("c").cast("long").alias("total"),
    )
    target = F.expr(f"(total + {AQE_TARGET_DIV - 1}) div {AQE_TARGET_DIV}")
    folded = packed.select(
        target.alias("target"),
        F.aggregate(
            F.col("ps"),
            F.struct(
                F.lit(0).cast("int").alias("grp"),
                F.lit(0).cast("long").alias("run"),
                F.expr(
                    "CAST(array() AS array<struct<p:bigint,grp:int>>)"
                ).alias("out"),
            ),
            lambda acc, x: F.struct(
                F.when(
                    acc["run"] >= target, acc["grp"] + 1
                ).otherwise(acc["grp"]).alias("grp"),
                F.when(acc["run"] >= target, x["c"])
                .otherwise(acc["run"] + x["c"])
                .alias("run"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["p"].cast("bigint").alias("p"),
                            F.when(
                                acc["run"] >= target, acc["grp"] + 1
                            )
                            .otherwise(acc["grp"])
                            .cast("int")
                            .alias("grp"),
                        )
                    ),
                ).alias("out"),
            ),
        ).alias("acc"),
    )
    assign = folded.select(
        F.explode(F.col("acc.out")).alias("a")
    ).select(F.col("a.p").alias("p"), F.col("a.grp").alias("grp"))
    return (
        assign.join(counts, "p")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("c").cast("long").alias("rows"),
            F.min("p").cast("long").alias("first_p"),
            F.max("p").cast("long").alias("last_p"),
        )
        .orderBy("grp")
    )


SYS_SAMPLE_K = 10
SYS_SAMPLE_OFFSET = 3


def systematic_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling audit (every k-th element of the doc_id
    order, pinned offset): sample mean of n_chars vs the population
    mean and the relative error — the survey-sampling sibling of
    reservoir/stratified. Exact integer sums both legs; one bounded
    window for the row index."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("x")
    )
    # distributed global rank (ADVICE r4 remedy): doc_id is unique, so
    # range-partitioned offset ranks == the single-partition window's
    from lucene_mapreduce_spark.operators.parity import distributed_row_number

    idx = distributed_row_number(docs, "doc_id", "i1").withColumn(
        "i", F.col("i1") - 1
    )
    samp = idx.filter(
        F.pmod(F.col("i"), F.lit(SYS_SAMPLE_K)) == SYS_SAMPLE_OFFSET
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum("x").cast("long").alias("s_sample"),
    )
    pop = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum("x").cast("long").alias("s_pop"),
    )
    j = samp.crossJoin(F.broadcast(pop))
    ms = F.col("s_sample").cast("double") / F.col("n_sample").cast("double")
    mp = F.col("s_pop").cast("double") / F.col("n_pop").cast("double")
    return j.select(
        "n_sample",
        "n_pop",
        F.round(ms, 6).alias("sample_mean"),
        F.round(mp, 6).alias("pop_mean"),
        F.round(F.abs(ms - mp) / mp, 6).alias("rel_err"),
    )


BLOOM_JOIN_BITS = 65536  # k=1 bloom width for the semi-join pushdown


def bloom_join_pushdown_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bloom-filter join pushdown audit (Spark's runtime bloom-filter
    join / DPP cousin): the build side is orders filtered to 1998-Q1;
    its orderkeys hash (k=1, BLOOM_JOIN_BITS buckets, engine-shared
    md5) into a filter the lineitem probe side consults BEFORE the
    shuffle. The report: probe rows, true matches, rows passing the
    filter, false passes, and the shuffle-reduction ratio — the numbers
    that justify spark.sql.optimizer.runtime.bloomFilter.enabled at
    100 TB. The filter is an exact distinct-bucket semi-join (an honest
    one-hash bloom), so both engines compute identical pass sets."""
    lo_us, hi_us = 883612800000000, 891302400000000  # 1998-01-01..03-31
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "d_us"
        ),
    )
    build = orders.filter(
        F.col("d_us").between(lo_us, hi_us)
    ).select("o_orderkey")

    def bucket(col):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(col.cast("string"), F.lit(":bj"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(BLOOM_JOIN_BITS),
        )

    bloom = build.select(bucket(F.col("o_orderkey")).alias("b")).distinct()
    probe = load(spark, sf_dir, "lineitem").select("l_orderkey")
    passed = probe.join(
        bloom, bucket(F.col("l_orderkey")) == F.col("b"), "left_semi"
    )
    matched = probe.join(
        build.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    n_probe = probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe"))
    n_pass = passed.agg(F.count(F.lit(1)).cast("long").alias("n_pass"))
    n_match = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_match")
    )
    n_build = build.agg(
        F.count(F.lit(1)).cast("long").alias("n_build_keys")
    )
    return (
        n_probe.crossJoin(n_pass)
        .crossJoin(n_match)
        .crossJoin(n_build)
        .select(
            "n_build_keys",
            "n_probe",
            "n_match",
            "n_pass",
            (F.col("n_pass") - F.col("n_match"))
            .cast("long")
            .alias("false_passes"),
            F.round(
                F.lit(1.0)
                - F.col("n_pass").cast("double")
                / F.col("n_probe").cast("double"),
                6,
            ).alias("shuffle_reduction"),
        )
    )


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, public) of the
    co-order part graph: the Pearson correlation of endpoint degrees
    over edges, computed on the DIRECTED edge multiset (each undirected
    edge contributes both orientations — the standard convention that
    makes the coefficient symmetric). Sufficient statistics are exact
    BIGINT sums of degrees and degree products over edges; the final
    correlation is one fixed IEEE chain. Graph-sized joins only."""
    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    adj = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    deg = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    du = deg.select(F.col("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dy"))
    ed = adj.join(du, "u").join(dv, "v")
    agg = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        md * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        md * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return agg.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of lineitem extendedprice per
    returnflag — the weighted quantile the percentile family was
    missing (every row counts l_quantity times): sort by (price,
    orderkey, linenumber) within the flag, take the first row whose
    cumulative weight reaches half the total — exact integer weight
    arithmetic (quantities are integral TPC-H values), cross-multiplied
    so no division appears before the output round. One partitioned
    cumulative window at group size."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice"), 2)
        .cast("decimal(18,2)")
        .alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = li.groupBy("l_returnflag").agg(
        F.sum("w").cast("long").alias("wtot"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    cum = li.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wcum).cast("long").alias("cw"),
    )
    # first row with 2*cw >= wtot (cross-multiplied half)
    hit = (
        cum.join(tot, "l_returnflag")
        .filter(F.col("cw") * 2 >= F.col("wtot"))
        .groupBy("l_returnflag", "wtot", "n_rows")
        .agg(F.min(F.struct("cw", "price")).alias("m"))
    )
    return hit.select(
        "l_returnflag",
        "n_rows",
        F.col("wtot").alias("total_weight"),
        F.round(F.col("m.price").cast("double"), 2).alias(
            "weighted_median"
        ),
    ).orderBy("l_returnflag")


def local_clustering_topk(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Per-node local clustering coefficient over the co-order part
    graph — affinity_triangles' global census localized: lcc(v) =
    triangles_at_v / C(deg v, 2), triangles enumerated once under the
    a<b<c orientation and credited to all three corners via one
    explode. Top-k by (lcc desc, node asc) among nodes with degree >=
    2, lcc ranked on the 6dp round (the random_score rule). Exact
    integers until the final ratio."""
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("y2"), F.col("pb").alias("z"))
    e3 = edges.select(F.col("pa").alias("x3"), F.col("pb").alias("z3"))
    tri = (
        e1.join(e2, e1.y == e2.y2)
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )
    corner = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    lcc = (
        deg.filter(F.col("d") >= 2)
        .join(corner, "node", "left")
        .select(
            "node",
            "d",
            F.coalesce("t", F.lit(0)).cast("long").alias("t"),
            F.round(
                F.lit(2.0)
                * F.coalesce("t", F.lit(0)).cast("double")
                / (
                    F.col("d").cast("double")
                    * (F.col("d").cast("double") - F.lit(1.0))
                ),
                6,
            ).alias("lcc"),
        )
    )
    return ranked_topk(
        lcc, [F.desc("lcc"), F.asc("node")], k
    ).select(
        F.col("node").alias("p_partkey"), "d", "t", "lcc", "rank"
    )


def jain_fairness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index over per-user event counts — the
    multi-tenant load-share metric (Jain/Chiu/Hawe 1984, public):
    J = (sum x)^2 / (n * sum x^2), 1.0 = perfectly even, 1/n = one
    tenant hogs everything. Exact BIGINT sufficient statistics; one
    user-cardinality groupBy."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    j = (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (F.col("n_users").cast("double") * F.col("sxx").cast("double"))
    return agg.select(
        "n_users",
        F.col("sx").alias("n_events"),
        F.round(j, 6).alias("jain_index"),
        F.round(F.lit(1.0) / F.col("n_users").cast("double"), 6).alias(
            "worst_case"
        ),
    )


def file_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-depth metric for the file_skipping_audit layouts: for
    each of the 64 ntile files, how many OTHER files' [min,max]
    orderdate ranges overlap it — the overlap-depth statistic lakehouse
    OPTIMIZE jobs watch (depth ~ n under arrival order, ~1 after the
    clustered rewrite; residual overlap comes from duplicate boundary
    dates). The 64x64 interval join is file-count-bounded, never
    row-bounded. Reports per-layout mean/max depth."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "d_us"
        ),
    )
    out = None
    for lname, w in (
        ("arrival", Window.orderBy("o_orderkey")),
        ("date_sorted", Window.orderBy("d_us", "o_orderkey")),
    ):
        files = (
            orders.select(
                F.ntile(SKIP_N_FILES).over(w).alias("f"), "d_us"
            )
            .groupBy("f")
            .agg(F.min("d_us").alias("mn"), F.max("d_us").alias("mx"))
        )
        a = files.select(
            F.col("f").alias("fa"), F.col("mn").alias("mna"),
            F.col("mx").alias("mxa"),
        )
        b = files.select(
            F.col("f").alias("fb"), F.col("mn").alias("mnb"),
            F.col("mx").alias("mxb"),
        )
        depth = (
            a.join(
                b,
                (F.col("fa") != F.col("fb"))
                & (F.col("mna") <= F.col("mxb"))
                & (F.col("mxa") >= F.col("mnb")),
            )
            .groupBy("fa")
            .agg(F.count(F.lit(1)).cast("long").alias("depth"))
        )
        full = a.join(depth, "fa", "left").select(
            F.coalesce("depth", F.lit(0)).cast("long").alias("depth")
        )
        row = full.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.round(
                F.sum("depth").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_overlap_depth"),
            F.max("depth").cast("long").alias("max_overlap_depth"),
        ).select(
            F.lit(lname).alias("layout"),
            "n_files",
            "mean_overlap_depth",
            "max_overlap_depth",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("layout")


JOIN_CARD_PAIRS = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
]


def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit — the selectivity audit's join
    sibling: the textbook CBO estimate |A join B| = |A|*|B|/max(ndv_a,
    ndv_b) against the measured row count, with the q-error planners
    benchmark on (Leis et al., "How Good Are Query Optimizers",
    public). NDVs are exact distincts (what perfect statistics would
    give — the residual q-error is the MODEL's error, not the stats').
    One aggregate per side plus the actual join count per pair."""
    out = None
    for name, ta, ka, tb, kb in JOIN_CARD_PAIRS:
        a = load(spark, sf_dir, ta).select(F.col(ka).alias("k"))
        b = load(spark, sf_dir, tb).select(F.col(kb).alias("k"))
        sa = a.agg(
            F.count(F.lit(1)).cast("long").alias("na"),
            F.countDistinct("k").cast("long").alias("da"),
        )
        sb = b.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.countDistinct("k").cast("long").alias("db"),
        )
        actual = a.join(b, "k").agg(
            F.count(F.lit(1)).cast("long").alias("n_actual")
        )
        j = sa.crossJoin(sb).crossJoin(actual)
        est = (
            F.col("na").cast("double")
            * F.col("nb").cast("double")
            / F.greatest(F.col("da"), F.col("db")).cast("double")
        )
        act = F.col("n_actual").cast("double")
        row = j.select(
            F.lit(name).alias("pair"),
            "na",
            "nb",
            "da",
            "db",
            "n_actual",
            F.round(est, 6).alias("n_estimated"),
            F.round(
                F.when(
                    act > 0, F.greatest(est / act, act / est)
                ).otherwise(F.lit(None)),
                6,
            ).alias("q_error"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")


def business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in BUSINESS days (weekends excluded) per
    priority — the SLA convention finance reporting wants, computed
    with pure integer calendar arithmetic: full weeks contribute 5
    days; the remainder walks the anchored day-of-week ((epoch_day -
    2024-01-01) mod 7, the house dow rule — 2024-01-01 was a Monday)
    counting only dows 0-4. p50/p90 over line items per priority via
    the exact type-7 percentile. No engine date functions anywhere."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
        ).alias("ship_d"),
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("ord_d"),
    )
    j = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).filter(F.col("ship_d") >= F.col("ord_d"))
    # business days in [ord_d, ship_d): full weeks x 5 + remainder scan
    n_days = F.col("ship_d") - F.col("ord_d")
    full_weeks = F.expr("(ship_d - ord_d) div 7")
    rem = n_days - full_weeks * 7
    start_dow = F.pmod(F.col("ord_d") - F.lit(DOW_ANCHOR), F.lit(7))
    # remainder contribution: count of i in [0, rem) with
    # (start_dow + i) % 7 < 5 — rem <= 6, unrolled as a bounded sum
    rem_biz = F.lit(0)
    for i in range(7):
        rem_biz = rem_biz + F.when(
            (F.lit(i) < rem)
            & (F.pmod(start_dow + F.lit(i), F.lit(7)) < 5),
            1,
        ).otherwise(0)
    biz = (full_weeks * 5 + rem_biz).cast("double")
    return (
        j.select("o_orderpriority", biz.alias("biz_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.expr("percentile(biz_days, 0.5)"), 6).alias(
                "p50_biz_days"
            ),
            F.round(F.expr("percentile(biz_days, 0.9)"), 6).alias(
                "p90_biz_days"
            ),
            F.max("biz_days").cast("long").alias("max_biz_days"),
        )
        .orderBy("o_orderpriority")
    )


DOW_ANCHOR = 19723  # 2024-01-01, a Monday (epoch days)
DIVMOD_PROBE_SHIFT = 75  # derives negative operands from user ids


def integer_division_semantics_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Integer division/modulo semantics gate for NEGATIVE operands —
    the silent-corruption trap behind the house `div`/pmod rules:
    for data-derived signed values a = user_id - DIVMOD_PROBE_SHIFT,
    the page shows truncating division (a div 7: both engines truncate
    toward zero), the sign-following remainder (a % 7: dividend sign,
    both engines), and the always-positive pmod — counts per
    (sign bucket) plus md5 witnesses over the ascending triples, so
    any engine divergence in ANY row flips the hash. Bounded by the
    user-id domain."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") - F.lit(DIVMOD_PROBE_SHIFT)).alias("a")
    ).distinct()
    trip = ev.select(
        "a",
        F.expr("a div 7").cast("long").alias("tdiv"),
        (F.col("a") % 7).cast("long").alias("srem"),
        F.pmod(F.col("a"), F.lit(7)).cast("long").alias("pmod7"),
    )
    return (
        trip.groupBy(
            F.when(F.col("a") < 0, F.lit("negative"))
            .otherwise(F.lit("non_negative"))
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("tdiv").cast("long").alias("sum_tdiv"),
            F.sum("srem").cast("long").alias("sum_srem"),
            F.sum("pmod7").cast("long").alias("sum_pmod"),
            F.md5(
                F.array_join(
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(
                                ":",
                                F.col("a").cast("string"),
                                F.col("tdiv").cast("string"),
                                F.col("srem").cast("string"),
                                F.col("pmod7").cast("string"),
                            )
                        )
                    ),
                    ",",
                )
            ).alias("witness"),
        )
        .orderBy("bucket")
    )


def _affinity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-order part graph shared by the link-prediction family: edges =
    part pairs co-ordered in >= AFFINITY_MIN_SUPPORT orders, oriented
    pa < pb (affinity_triangles' graph)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )


LINKPRED_K = 20
LINKPRED_MAX_CENTER_DEG = 4096  # hot-node wedge cap, inactive at test SFs


def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-order part graph: for every NON-edge at
    distance 2, common-neighbor count, neighbor-set Jaccard, Adamic-Adar
    (sum 1/ln deg(w)) and resource allocation (sum 1/deg(w)) — the four
    classic unsupervised scores (Liben-Nowell & Kleinberg). Distributed as
    wedge enumeration anchored at the common neighbor w (cost sum deg(w)^2,
    hot centers capped at LINKPRED_MAX_CENTER_DEG before the self-join —
    the same cap-before-join discipline as the dedup shingle paths);
    existing edges leave via one anti-join. AA/RA contributions re-enter
    DECIMAL at 12dp so the per-pair sums are order-free at any
    parallelism; ranking on the exact DECIMAL aa with (u, v) tie-break.
    Top-LINKPRED_K page."""
    edges = _affinity_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    nbrs = (
        edges.select(F.col("pa").alias("node"), F.col("pb").alias("nbr"))
        .unionAll(
            edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
        )
        .join(deg, "node")
        .filter(F.col("d") <= LINKPRED_MAX_CENTER_DEG)
    )
    x = nbrs.select(
        F.col("node").alias("w"), F.col("d").alias("dw"), F.col("nbr").alias("u")
    )
    y = nbrs.select(F.col("node").alias("w2"), F.col("nbr").alias("v"))
    wedges = x.join(y, (F.col("w") == F.col("w2")) & (F.col("u") < F.col("v")))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum(
            F.round(F.lit(1.0) / F.log(F.col("dw").cast("double")), 12).cast(
                "decimal(28,12)"
            )
        ).alias("aa"),
        F.sum(
            F.round(F.lit(1.0) / F.col("dw").cast("double"), 12).cast(
                "decimal(28,12)"
            )
        ).alias("ra"),
    )
    cand = pairs.join(
        edges,
        (pairs.u == edges.pa) & (pairs.v == edges.pb),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    scored = (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
            F.col("aa").alias("aa_exact"),
            F.col("ra").alias("ra_exact"),
        )
    )
    w = Window.orderBy(F.col("aa_exact").desc(), "u", "v")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= LINKPRED_K)
        .select(
            "rank",
            "u",
            "v",
            "cn",
            "jaccard",
            F.round(F.col("aa_exact").cast("double"), 6).alias("adamic_adar"),
            F.round(F.col("ra_exact").cast("double"), 6).alias("resource_alloc"),
        )
    )


KATZ_BETA_NUM = 5  # beta = 0.05 carried as exact DECIMAL scales
KATZ_K = 20


def katz_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz index for link prediction: sum over walk lengths
    beta^2 * (#2-walks) + beta^3 * (#3-walks) between non-adjacent part
    pairs (the length-1 term is zero on non-edges by construction), with
    the pinned beta = 0.05 whose powers are EXACT decimals — so the whole
    score is exact DECIMAL arithmetic over BIGINT walk counts, no float
    until display. Walk counts via two chained equi-joins of the adjacency
    list (the standard A^2 / A^3 matrix-power shape; at 100 TB the chain
    is degree-capped like link_prediction_scores). Top-KATZ_K by exact
    score, (u, v) tie-break."""
    edges = _affinity_edges(spark, sf_dir)
    nbrs = edges.select(
        F.col("pa").alias("s"), F.col("pb").alias("t")
    ).unionAll(edges.select(F.col("pb").alias("s"), F.col("pa").alias("t")))
    a1 = nbrs.select(F.col("s").alias("u"), F.col("t").alias("m"))
    a2 = (
        a1.join(
            nbrs.select(F.col("s").alias("m"), F.col("t").alias("v")), "m"
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w2"))
    )
    a3 = (
        a2.select(F.col("u"), F.col("v").alias("m"), "w2")
        .join(nbrs.select(F.col("s").alias("m"), F.col("t").alias("v")), "m")
        .groupBy("u", "v")
        .agg(F.sum("w2").cast("long").alias("w3"))
    )
    both = (
        a2.join(a3, ["u", "v"], "full")
        .select(
            "u",
            "v",
            F.coalesce("w2", F.lit(0)).cast("long").alias("w2"),
            F.coalesce("w3", F.lit(0)).cast("long").alias("w3"),
        )
        .filter(F.col("u") < F.col("v"))
    )
    cand = both.join(
        edges,
        (both.u == edges.pa) & (both.v == edges.pb),
        "left_anti",
    )
    # beta = 0.05: beta^2 = 2500e-6, beta^3 = 125e-6 — the score is the
    # exact BIGINT micro-units w2*2500 + w3*125; float only at display
    kz = F.col("w2") * F.lit(2500) + F.col("w3") * F.lit(125)
    w = Window.orderBy(kz.desc(), "u", "v")
    return (
        cand.withColumn("kz", kz.cast("long"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KATZ_K)
        .select(
            "rank",
            "u",
            "v",
            "w2",
            "w3",
            (F.col("kz").cast("double") / F.lit(1000000.0)).alias("katz"),
        )
    )


MOR_FILE_ROWS = 64  # doc_id-range width per modeled data file
MOR_DELETE_NUM = 3  # deletion rate = 3/20 md5-uniform
MOR_REWRITE_FRAC = 0.25


def merge_on_read_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete-vector amplification report (the Iceberg v2 /
    Delta deletion-vector accounting): documents sit in doc_id-range files
    of MOR_FILE_ROWS rows; a deterministic md5-uniform 15% of rows carry
    positional deletes. Per file: rows, deletes, live rows, delete
    fraction, the read amplification a MoR scan pays (rows scanned / live
    rows returned), and the compact flag at MOR_REWRITE_FRAC — the table
    that decides when eager rewrite beats deferred merge. The delete draw
    compares 20*u < 3*2^52 in exact integers (never a float threshold).
    One groupBy, file-count-bounded output."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mordel"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    deleted = (u * F.lit(20) < F.lit(3 * (1 << 52))).cast("int")
    g = docs.select(
        F.expr(f"CAST(doc_id DIV {MOR_FILE_ROWS} AS BIGINT)").alias("file_id"),
        deleted.alias("del"),
    ).groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("del").cast("long").alias("n_deleted"),
    )
    live = F.col("n_rows") - F.col("n_deleted")
    frac = F.col("n_deleted").cast("double") / F.col("n_rows").cast("double")
    return g.select(
        "file_id",
        "n_rows",
        "n_deleted",
        live.alias("n_live"),
        F.round(frac, 6).alias("delete_frac"),
        F.round(
            F.when(
                live > 0, F.col("n_rows").cast("double") / live.cast("double")
            ),
            6,
        ).alias("read_amplification"),
        (F.round(frac, 6) >= F.lit(MOR_REWRITE_FRAC)).alias("rewrite_flag"),
    ).orderBy("file_id")


# ---------------------------------------------------------------------------
# Batch 116: power-law degree MLE over the co-order part graph
# ---------------------------------------------------------------------------


def degree_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-approximation power-law exponent MLE (Clauset, Shalizi
    & Newman 2009) over the degree distribution of the co-order part
    graph (the same edge set as part_pagerank_3iter / katz_index_pairs):
    alpha = 1 + n / sum_i ln(d_i / (d_min - 0.5)).  Every summand is a
    single correctly-rounded ln of identical operands, rounded 12dp and
    summed as DECIMAL (order-free); d_min rides a broadcast scalar.
    One self-join bounded by basket size builds the edges, one groupBy
    the degrees — the degree table is node-count-sized."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dmin = deg.agg(
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )
    terms = deg.crossJoin(F.broadcast(dmin)).select(
        "d_min",
        "d_max",
        "n_nodes",
        F.round(
            F.log(
                F.col("d").cast("double")
                / (F.col("d_min").cast("double") - F.lit(0.5))
            ),
            12,
        )
        .cast("decimal(28,12)")
        .alias("lt"),
    )
    g = terms.groupBy("n_nodes", "d_min", "d_max").agg(
        F.sum("lt").alias("sum_log")
    )
    return g.select(
        "n_nodes",
        "d_min",
        "d_max",
        F.round(F.col("sum_log").cast("double"), 9).alias("sum_log"),
        F.round(
            F.lit(1.0)
            + F.col("n_nodes").cast("double") / F.col("sum_log").cast("double"),
            6,
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# Batch 119: personalized PageRank from a deterministic seed
# ---------------------------------------------------------------------------

PPR_D = 0.85
PPR_ITERS = 3
PPR_TOP_K = 20


def personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart) over the
    undirected co-order part graph — part_pagerank_3iter's seeded twin:
    the teleport mass (1-d) lands ONLY on the seed node (the smallest
    part key in the graph, a scale-free pin), so scores measure
    proximity to the seed instead of global centrality (the
    related-items / node-similarity primitive).  Three unrolled
    iterations; each is one join + one aggregate with neighbor
    contributions rounded 12dp into DECIMAL (order-free), and the rank
    vector is re-anchored on the full node set every iteration via a
    left join so unreached nodes carry exact zeros.  Nodes still at
    zero after 3 hops are dropped before the top-k rank."""
    from pyspark.sql.window import Window

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )
    edges = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    seed = deg.agg(F.min("src").alias("seed"))
    nodes = deg.select("src").crossJoin(F.broadcast(seed))
    rank = nodes.select(
        "src",
        "seed",
        F.when(F.col("src") == F.col("seed"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("r"),
    )
    for _ in range(PPR_ITERS):
        contrib = (
            edges.join(rank.select("src", "r"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.round(
                        F.lit(PPR_D) * F.col("r") / F.col("deg").cast("double"),
                        12,
                    ).cast("decimal(28,12)")
                )
                .cast("double")
                .alias("sc")
            )
        )
        rank = nodes.join(
            contrib, nodes.src == contrib.node, "left"
        ).select(
            "src",
            "seed",
            (
                F.when(F.col("src") == F.col("seed"), F.lit(1.0 - PPR_D))
                .otherwise(F.lit(0.0))
                + F.coalesce("sc", F.lit(0.0))
            ).alias("r"),
        )
    scored = rank.filter(F.col("r") > 0).select(
        F.col("src").alias("part"), F.round("r", 6).alias("ppr")
    )
    w = Window.orderBy(F.col("ppr").desc(), F.col("part").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PPR_TOP_K)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Batch 120: Hilbert-curve file clustering vs Z-order
# ---------------------------------------------------------------------------

HILBERT_N = 16  # grid side = 2^4: both bucket dims are 4-bit, as in zorder


def hilbert_step_exprs(s: int, x: str, y: str, divop: str):
    """One unrolled step of the classic xy2d Hilbert walk (bit s), as
    SQL text shared verbatim by Spark (`div`) and DuckDB (`//`): pure
    integer div/mod/CASE — the quadrant term replaces (3*rx) XOR ry
    with its closed CASE form, and the rotation is the standard
    reflect+swap with the full-grid N-1 reflector.  Returns
    (d_term, x_next, y_next) reading ONLY the step's input columns —
    no lateral alias capture in either engine."""
    rx = f"((({x}) {divop} {s}) % 2)"
    ry = f"((({y}) {divop} {s}) % 2)"
    d_term = f"{s * s} * (CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    nx = (
        f"CASE WHEN {ry} = 1 THEN ({x}) "
        f"WHEN {rx} = 1 THEN {HILBERT_N - 1} - ({y}) ELSE ({y}) END"
    )
    ny = (
        f"CASE WHEN {ry} = 1 THEN ({y}) "
        f"WHEN {rx} = 1 THEN {HILBERT_N - 1} - ({x}) ELSE ({x}) END"
    )
    return d_term, nx, ny


def hilbert_layout_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve file clustering vs Z-order (the Delta/Iceberg
    OPTIMIZE debate quantified): identical file count, probe ranges and
    min/max skip accounting as zorder_layout_plan, but the sort key of
    the second layout is the Hilbert d-index of the two 16-level key
    buckets — the space-filling curve with strictly better worst-case
    locality than Morton (no diagonal jumps), which is why engines that
    offer both default to Hilbert.  The xy2d walk is 4 unrolled
    integer-only steps (hilbert_step_exprs, shared SQL text with the
    oracle); everything downstream is zorder_layout_plan's exact
    integer skip report.  The single-partition ntile window is the
    test-scale stand-in for repartitionByRange on the same key."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    mrow = li.agg(
        F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my")
    ).collect()[0]
    nx, ny = int(mrow["mx"]) + 1, int(mrow["my"]) + 1
    bx = f"(l_partkey * {ZORDER_X_BUCKETS}) div {nx}"
    by = f"(l_suppkey * {ZORDER_Y_BUCKETS}) div {ny}"
    li = li.withColumn("z", F.expr(_z_expr(bx, by, "div"))).withColumn(
        "x0", F.expr(bx)
    ).withColumn("y0", F.expr(by)).withColumn("d0", F.lit(0))
    step = 0
    s = HILBERT_N // 2
    while s > 0:
        d_term, nxp, nyp = hilbert_step_exprs(
            s, f"x{step}", f"y{step}", "div"
        )
        li = li.select(
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "z",
            F.expr(f"d{step} + {d_term}").alias(f"d{step + 1}"),
            F.expr(nxp).alias(f"x{step + 1}"),
            F.expr(nyp).alias(f"y{step + 1}"),
        )
        step += 1
        s //= 2
    li = li.withColumnRenamed(f"d{step}", "h")
    pb = ZORDER_PRED_BUCKET
    preds = {
        "x_range": (
            "l_partkey",
            nx * pb // ZORDER_X_BUCKETS,
            nx * (pb + 1) // ZORDER_X_BUCKETS - 1,
        ),
        "y_range": (
            "l_suppkey",
            ny * pb // ZORDER_Y_BUCKETS,
            ny * (pb + 1) // ZORDER_Y_BUCKETS - 1,
        ),
    }
    layouts = {
        "hilbert": Window.orderBy(
            "h", "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
        ),
        "zorder": Window.orderBy(
            "z", "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
        ),
    }
    matched = li.agg(
        *[
            F.sum(F.col(c).between(lo, hi).cast("int"))
            .cast("long")
            .alias(f"m_{p}")
            for p, (c, lo, hi) in preds.items()
        ]
    )
    out = None
    for lname, w in layouts.items():
        files = (
            li.select(
                F.ntile(ZORDER_N_FILES).over(w).alias("f"),
                "l_partkey",
                "l_suppkey",
            )
            .groupBy("f")
            .agg(
                F.min("l_partkey").alias("min_x"),
                F.max("l_partkey").alias("max_x"),
                F.min("l_suppkey").alias("min_y"),
                F.max("l_suppkey").alias("max_y"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )
        for pname, (col, lo, hi) in preds.items():
            mn, mx = ("min_x", "max_x") if col == "l_partkey" else (
                "min_y",
                "max_y",
            )
            hit = (F.col(mn) <= hi) & (F.col(mx) >= lo)
            row = (
                files.agg(
                    F.count(F.lit(1)).cast("long").alias("n_files"),
                    F.sum(hit.cast("int")).cast("long").alias("files_read"),
                    F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
                    .cast("long")
                    .alias("rows_scanned"),
                )
                .crossJoin(F.broadcast(matched))
                .select(
                    F.lit(lname).alias("layout"),
                    F.lit(pname).alias("predicate"),
                    "n_files",
                    "files_read",
                    (F.col("n_files") - F.col("files_read"))
                    .cast("long")
                    .alias("files_skipped"),
                    F.col(f"m_{pname}").alias("rows_matched"),
                    "rows_scanned",
                    F.round(
                        F.col("rows_scanned").cast("double")
                        / F.col(f"m_{pname}").cast("double"),
                        6,
                    ).alias("read_amplification"),
                )
            )
            out = row if out is None else out.unionByName(row)
    return out.orderBy("layout", "predicate")


# ---------------------------------------------------------------------------
# Batch 123: Jonckheere-Terpstra ordered-alternative test
# ---------------------------------------------------------------------------


def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ordered trend in order SIZE
    (lineitems per order) across the five priority classes (lexical
    order '1-URGENT'..'5-LOW' is the natural ordering) — the
    ordered-alternative sibling of kruskal_wallis_h, more powerful
    when the alternative is monotone.  The measurement is a SMALL
    integer, so every pairwise Mann-Whitney count collapses onto the
    (group, value)-count table: 2*U_ij = sum over value pairs of
    2*c_i(v<w)*c_j(w) + ties, exact BIGINT via a cross join of tables
    bounded by |values| x |groups| — never an order-pair blowup.  The
    null mean (N^2 - sum n_g^2)/4 and variance (N^2(2N+3) - sum
    n_g^2(2n_g+3))/72 are integer-derived.  One lineitem groupBy, one
    orders join, tiny algebra after."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("grp")
    )
    sz = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    obs = orders.join(sz, orders.o_orderkey == sz.l_orderkey).select(
        "grp", "v"
    )
    cnt = obs.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = cnt.select(
        F.col("grp").alias("ga"), F.col("v").alias("va"), F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("grp").alias("gb"), F.col("v").alias("vb"), F.col("c").alias("cb")
    )
    jt2 = (
        a.join(b, F.col("ga") < F.col("gb"))
        .select(
            F.when(F.col("va") < F.col("vb"), 2 * F.col("ca") * F.col("cb"))
            .when(F.col("va") == F.col("vb"), F.col("ca") * F.col("cb"))
            .otherwise(F.lit(0))
            .alias("u2")
        )
        .agg(F.sum("u2").cast("long").alias("jt2"))
    )
    sizes = obs.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    g = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum(F.col("n_g") * F.col("n_g")).cast("long").alias("sn2"),
        F.sum(
            F.col("n_g") * F.col("n_g") * (2 * F.col("n_g") + 3)
        )
        .cast("long")
        .alias("sn23"),
    )
    nD = F.col("n_total").cast("double")
    e = (nD * nD - F.col("sn2").cast("double")) / F.lit(4.0)
    var = (
        nD * nD * (F.lit(2.0) * nD + F.lit(3.0))
        - F.col("sn23").cast("double")
    ) / F.lit(72.0)
    return (
        jt2.crossJoin(F.broadcast(g))
        .select(
            "n_groups",
            "n_total",
            "jt2",
            F.round(e, 6).alias("e_jt"),
            F.round(
                (F.col("jt2").cast("double") / F.lit(2.0) - e) / F.sqrt(var),
                6,
            ).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 127: shift-share revenue decomposition
# ---------------------------------------------------------------------------

SHIFT_SHARE_Y1 = ("1996-01-01", "1997-01-01")
SHIFT_SHARE_Y2 = ("1997-01-01", "1998-01-01")


def revenue_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of year-over-year order revenue by
    customer nation (the regional-economics identity, priority class
    standing in for 'industry'): each nation's actual revenue change
    splits into the national-growth term r1*G, the mix term
    sum_p r1_np (G_p - G) (was the nation loaded with fast- or
    slow-growing priorities?) and the residual competitive-shift
    term.  Revenue rides exact DECIMAL(28,2) sums; growth rates are
    one double chain from those; the <=5 per-nation mix terms are
    12dp-rounded DECIMALs (order-free).  Two scans' worth of orders,
    nation-grain output."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    legs = {}
    for tag, (lo, hi) in (("r1", SHIFT_SHARE_Y1), ("r2", SHIFT_SHARE_Y2)):
        legs[tag] = (
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            )
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey", "o_orderpriority")
            .agg(
                F.sum(
                    F.round("o_totalprice", 2).cast("decimal(28,2)")
                ).alias(tag)
            )
        )
    np_ = legs["r1"].join(
        legs["r2"], ["c_nationkey", "o_orderpriority"], "full"
    ).select(
        "c_nationkey",
        "o_orderpriority",
        F.coalesce("r1", F.lit(0)).cast("decimal(28,2)").alias("r1"),
        F.coalesce("r2", F.lit(0)).cast("decimal(28,2)").alias("r2"),
    )
    pr = np_.groupBy("o_orderpriority").agg(
        F.sum("r1").alias("p1"), F.sum("r2").alias("p2")
    )
    tot = np_.agg(F.sum("r1").alias("t1"), F.sum("r2").alias("t2"))
    g_all = (
        F.col("t2").cast("double") / F.col("t1").cast("double") - F.lit(1.0)
    )
    withg = (
        np_.join(F.broadcast(pr), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "r1",
            "r2",
            F.when(
                F.col("p1") > 0,
                F.round(
                    F.col("r1").cast("double")
                    * (
                        (
                            F.col("p2").cast("double")
                            / F.col("p1").cast("double")
                            - F.lit(1.0)
                        )
                        - g_all
                    ),
                    12,
                ),
            )
            .otherwise(F.lit(0.0))  # empty-y1 priority: r1 = 0, no mix share
            .cast("decimal(38,12)")
            .alias("mix12"),
            g_all.alias("g"),
        )
    )
    per_nation = withg.groupBy("c_nationkey").agg(
        F.sum("r1").alias("rev1"),
        F.sum("r2").alias("rev2"),
        F.sum("mix12").cast("double").alias("mix"),
        F.first("g").alias("g"),
    )
    nat = F.col("rev1").cast("double") * F.col("g")
    delta = (F.col("rev2") - F.col("rev1")).cast("double")
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation.c_nationkey == nation.n_nationkey,
        )
        .select(
            "n_name",
            F.round(F.col("rev1").cast("double"), 2).alias("rev1"),
            F.round(F.col("rev2").cast("double"), 2).alias("rev2"),
            F.round(delta, 2).alias("actual_delta"),
            F.round(nat, 4).alias("national_term"),
            F.round(F.col("mix"), 4).alias("mix_term"),
            F.round(delta - nat - F.col("mix"), 4).alias("shift_term"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Batch 129: log-log price elasticity
# ---------------------------------------------------------------------------


def price_elasticity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-elasticity demand fit: OLS of ln(quantity) on
    ln(unit price) across lineitem rows (unit price =
    extendedprice / quantity) — the econometric reading of the
    warehouse, with the slope as the price elasticity of demand and
    R^2 from the same sufficient statistics.  Both logs are
    12dp-rounded before entering the DECIMAL-summed moment matrix
    (the ols_token_chars_fit discipline on ln-transformed variables);
    one scan, one row."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(
            F.log(F.col("l_extendedprice") / F.col("l_quantity")), 12
        ).alias("x"),
        F.round(F.log("l_quantity"), 12).alias("y"),
    )
    terms = li.select(
        F.col("x").cast("decimal(28,12)").alias("x12"),
        F.col("y").cast("decimal(28,12)").alias("y12"),
        F.round(F.col("x") * F.col("y"), 12)
        .cast("decimal(38,12)")
        .alias("xy12"),
        F.round(F.col("x") * F.col("x"), 12)
        .cast("decimal(38,12)")
        .alias("xx12"),
        F.round(F.col("y") * F.col("y"), 12)
        .cast("decimal(38,12)")
        .alias("yy12"),
    )
    g = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x12").cast("double").alias("sx"),
        F.sum("y12").cast("double").alias("sy"),
        F.sum("xy12").cast("double").alias("sxy"),
        F.sum("xx12").cast("double").alias("sxx"),
        F.sum("yy12").cast("double").alias("syy"),
    )
    nD = F.col("n").cast("double")
    cov = nD * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nD * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nD * F.col("syy") - F.col("sy") * F.col("sy")
    b = cov / vx
    a = (F.col("sy") - b * F.col("sx")) / nD
    return g.select(
        "n",
        F.round(b, 6).alias("elasticity"),
        F.round(a, 6).alias("intercept"),
        F.round((cov * cov) / (vx * vy), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Batch 131: join-order cost audit
# ---------------------------------------------------------------------------


def join_order_cost_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-order cost enumeration for the customer-orders-lineitem
    chain — the optimizer decision join_cardinality_audit's estimates
    feed, here with EXACT intermediate cardinalities: cost of a plan =
    sum of its intermediate result sizes (the textbook C_out metric,
    Leis et al.), enumerated for the three orders including the
    Cartesian start (counted analytically as |C| x |L| — never
    executed).  The report ranks plans and shows the blowup factor of
    the worst order — the number that justifies join reordering at
    100 TB.  All BIGINTs from three counts and two real joins."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    n_c = cust.count()
    n_o = orders.count()
    n_l = li.count()
    co = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).count()
    ol = li.join(
        orders.withColumnRenamed("o_orderkey", "ok"),
        F.col("l_orderkey") == F.col("ok"),
    ).count()
    final = ol  # (c ⋈ o ⋈ l) keeps lineitem grain under the FK chain
    plans = [
        ("co_then_l", co, final),
        ("ol_then_c", ol, final),
        ("cl_cross_then_o", n_c * n_l, final),
    ]
    rows = [
        (name, inter, final, inter + final)
        for name, inter, final in plans
    ]
    best = min(c for _, _, _, c in rows)
    data = [
        (name, inter, fin, cost, round(cost / best, 6))
        for name, inter, fin, cost in rows
    ]
    return spark.createDataFrame(
        sorted(data),
        "plan string, intermediate_rows bigint, final_rows bigint,"
        " cost_cout bigint, blowup double",
    )


# ---------------------------------------------------------------------------
# Batch 133: dynamic-partition-pruning benefit audit
# ---------------------------------------------------------------------------

DPP_N_FILES = 64
DPP_PRIORITY = "1-URGENT"
DPP_WINDOW = ("1996-01-01", "1996-04-01")


def dpp_benefit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-partition-pruning benefit, measured exactly: lineitem
    laid into DPP_N_FILES orderkey-clustered files (ntile over the
    total order, the zorder/file_skipping discipline), probed by a
    selective dimension filter on orders (one priority, one quarter).
    A static plan scans every file; DPP broadcasts the surviving
    orderkeys and reads only files whose [min,max] orderkey span
    contains one — the runtime half of the skipping story
    (file_skipping_audit is the static half).  Output: exact files
    and rows read under both plans plus the matching-row floor."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    keys = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == DPP_PRIORITY)
            & (F.col("o_orderdate") >= DPP_WINDOW[0])
            & (F.col("o_orderdate") < DPP_WINDOW[1])
        )
        .select(F.col("o_orderkey").alias("k"))
    )
    w = Window.orderBy("l_orderkey", "l_linenumber")
    files = (
        li.select(
            F.ntile(DPP_N_FILES).over(w).alias("f"), "l_orderkey"
        )
        .groupBy("f")
        .agg(
            F.min("l_orderkey").alias("lo"),
            F.max("l_orderkey").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    hit_files = (
        keys.join(
            files,
            (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")),
        )
        .select("f")
        .distinct()
    )
    hit_stats = files.join(hit_files, "f").agg(
        F.count(F.lit(1)).cast("long").alias("files_read_dpp"),
        F.sum("n_rows").cast("long").alias("rows_scanned_dpp"),
    )
    totals = files.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("rows_total"),
    )
    matched = li.join(F.broadcast(keys), li.l_orderkey == keys.k).agg(
        F.count(F.lit(1)).cast("long").alias("rows_matched")
    )
    return (
        totals.crossJoin(F.broadcast(hit_stats))
        .crossJoin(F.broadcast(matched))
        .select(
            "n_files",
            "files_read_dpp",
            (F.col("n_files") - F.col("files_read_dpp"))
            .cast("long")
            .alias("files_skipped"),
            "rows_total",
            "rows_scanned_dpp",
            "rows_matched",
            F.round(
                F.col("rows_scanned_dpp").cast("double")
                / F.col("rows_matched").cast("double"),
                6,
            ).alias("read_amplification"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 134: filter-order audit + Little's law
# ---------------------------------------------------------------------------

FILTER_PREDS = ("qty", "disc", "ship")
FILTER_QTY_MAX = 10.0
FILTER_DISC_MIN = 0.05
FILTER_SHIP_WINDOW = ("1996-01-01", "1997-01-01")


def filter_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-ordering cost audit — join_order_cost_audit's
    single-table sibling: three pinned lineitem predicates, and for
    each of the 6 evaluation orders the exact rows INSPECTED
    (N for the first predicate, survivors of each prefix for the
    next) from the 8-cell truth table of one scan.  The report ranks
    orders and shows the blowup of the worst — why engines order
    conjuncts by selectivity.  All BIGINTs; the permutation algebra
    runs on 8 collected cells."""
    li = load(spark, sf_dir, "lineitem")
    flags = li.select(
        (F.col("l_quantity") <= FILTER_QTY_MAX).cast("int").alias("q"),
        (F.col("l_discount") >= FILTER_DISC_MIN).cast("int").alias("d"),
        (
            (F.col("l_shipdate") >= FILTER_SHIP_WINDOW[0])
            & (F.col("l_shipdate") < FILTER_SHIP_WINDOW[1])
        )
        .cast("int")
        .alias("s"),
    )
    cells = {
        (r["q"], r["d"], r["s"]): r["c"]
        for r in flags.groupBy("q", "d", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }

    def count_where(**want):
        return sum(
            c
            for (q, d, s), c in cells.items()
            if all(
                {"qty": q, "disc": d, "ship": s}[p] == 1
                for p in want.get("preds", ())
            )
        )

    n = sum(cells.values())
    from itertools import permutations

    rows = []
    for perm in permutations(FILTER_PREDS):
        cost = n
        cost += count_where(preds=perm[:1])
        cost += count_where(preds=perm[:2])
        rows.append(("_".join(perm), cost, count_where(preds=perm)))
    best = min(c for _, c, _ in rows)
    data = [
        (name, cost, fin, round(cost / best, 6))
        for name, cost, fin in rows
    ]
    return spark.createDataFrame(
        sorted(data),
        "filter_order string, rows_inspected bigint,"
        " rows_out bigint, blowup double",
    )


LITTLE_WINDOW = ("1996-01-01", "1997-01-01")
LITTLE_WINDOW_DAYS = 366  # 1996 is a leap year


def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (L = lambda W) measured on the order->ship
    pipeline over one pinned year: lambda = arrivals per day, W = mean
    order sojourn (orderdate to last lineitem shipdate, exact integer
    days, DECIMAL mean) for in-window arrivals, and L = time-average
    work-in-progress computed EXACTLY as sum of each order's overlap
    with the window / window length (the integral form — no per-day
    sweep).  The ratio L/(lambda W) reads how far the pipeline is
    from steady state — the queueing identity behind order_aging_wip's
    snapshot."""
    li = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("done")
    )
    o = (
        load(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
            ).alias("a"),
            F.expr(
                "unix_micros(cast(done as timestamp)) div 86400000000"
            ).alias("z"),
        )
    )
    lo, hi = [
        int(pd_ts)
        for pd_ts in [
            _day_number(LITTLE_WINDOW[0]),
            _day_number(LITTLE_WINDOW[1]),
        ]
    ]
    arrivals = o.filter((F.col("a") >= lo) & (F.col("a") < hi))
    w_stats = arrivals.agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.sum(F.col("z") - F.col("a")).cast("long").alias("sum_sojourn"),
    )
    overlap = F.greatest(
        F.lit(0),
        F.least(F.col("z"), F.lit(hi)) - F.greatest(F.col("a"), F.lit(lo)),
    )
    l_stats = o.agg(F.sum(overlap).cast("long").alias("sum_overlap"))
    lam = F.col("n_arrivals").cast("double") / F.lit(
        float(LITTLE_WINDOW_DAYS)
    )
    w = F.col("sum_sojourn").cast("double") / F.col("n_arrivals").cast(
        "double"
    )
    l_avg = F.col("sum_overlap").cast("double") / F.lit(
        float(LITTLE_WINDOW_DAYS)
    )
    return w_stats.crossJoin(F.broadcast(l_stats)).select(
        "n_arrivals",
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(w, 6).alias("w_days"),
        F.round(l_avg, 6).alias("l_avg"),
        F.round(l_avg / (lam * w), 6).alias("little_ratio"),
    )


def _day_number(date_str: str) -> int:
    """Epoch-day of a date literal (driver-side, shared with tests)."""
    import datetime

    return (
        datetime.date.fromisoformat(date_str) - datetime.date(1970, 1, 1)
    ).days


# ---------------------------------------------------------------------------
# Batch 135: rich-club coefficient
# ---------------------------------------------------------------------------

RICH_CLUB_KS = (2, 4, 8)


def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the co-order part graph at a pinned
    degree ladder — do high-degree parts preferentially co-occur with
    each other (the hub-interconnection statistic beside
    degree_assortativity's global correlation)?  phi(k) = 2 E_k /
    (n_k (n_k - 1)) over the subgraph induced by nodes with degree
    > k.  Degrees and induced-edge counts are exact BIGINTs from the
    same AFFINITY_MIN_SUPPORT edge list the PageRank family uses; the
    ladder is three broadcast-filtered passes over the (pa < pb) pair
    table."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= AFFINITY_MIN_SUPPORT)
        .select("pa", "pb")
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    out = None
    for k in RICH_CLUB_KS:
        rich = deg.filter(F.col("deg") > k).select("node")
        n_k = rich.count()
        e_k = (
            e.join(rich.withColumnRenamed("node", "pa"), "pa")
            .join(rich.withColumnRenamed("node", "pb"), "pb")
            .count()
        )
        phi = (
            round(2.0 * e_k / (n_k * (n_k - 1)), 6) if n_k >= 2 else None
        )
        leg = spark.createDataFrame(
            [(k, n_k, e_k, phi)],
            "k bigint, n_nodes bigint, n_edges bigint, phi double",
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("k")


# ---------------------------------------------------------------------------
# Batch 139: skew salting plan
# ---------------------------------------------------------------------------

SALT_DENOM = 256  # target rows per (key, salt) = ceil(total / SALT_DENOM)
SALT_TOP_K = 10


def salt_factor_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-salting plan for the lineitem-by-partkey shuffle —
    join_skew_report's actionable half: with target rows per reduce
    unit = ceil(total / SALT_DENOM) (scale-free), each hot key gets
    salt_factor = ceil(rows / target) sub-keys; the report shows the
    top-10 hottest keys with their before/after share of the largest
    reduce unit — the exact arithmetic behind the (phash, salt) keys
    the index build uses (CLAUDE.md shuffle-key rule).  All integer
    via the truncation-safe (a + b - 1) // b ceilings."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per.agg(F.sum("n_rows").cast("long").alias("total"))
    j = per.crossJoin(F.broadcast(tot))
    target = F.expr(f"(total + {SALT_DENOM} - 1) div {SALT_DENOM}")
    salt = F.expr(
        f"(n_rows + (total + {SALT_DENOM} - 1) div {SALT_DENOM} - 1)"
        f" div ((total + {SALT_DENOM} - 1) div {SALT_DENOM})"
    )
    scored = j.select(
        "l_partkey",
        "n_rows",
        "total",
        target.cast("long").alias("target_rows"),
        salt.cast("long").alias("salt_factor"),
        F.expr(
            f"(n_rows + (n_rows + (total + {SALT_DENOM} - 1)"
            f" div {SALT_DENOM} - 1) div ((total + {SALT_DENOM} - 1)"
            f" div {SALT_DENOM}) - 1) div ((n_rows + (total"
            f" + {SALT_DENOM} - 1) div {SALT_DENOM} - 1)"
            f" div ((total + {SALT_DENOM} - 1) div {SALT_DENOM}))"
        )
        .cast("long")
        .alias("rows_per_salt"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("l_partkey").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SALT_TOP_K)
        .select(
            "rank",
            "l_partkey",
            "n_rows",
            "target_rows",
            "salt_factor",
            F.round(
                F.col("n_rows").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("share_before"),
            F.round(
                F.col("rows_per_salt").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("share_after"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Batch 150: VWAP vs TWAP monthly
# ---------------------------------------------------------------------------


def vwap_twap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted vs time-weighted average unit price per ship
    month — the execution-quality pair from finance applied to the
    lineitem stream (VWAP follows where the QUANTITY went, TWAP gives
    every day equal say; their gap flags volume/price correlation
    within the month).  Months are epoch-day arithmetic (never engine
    date_trunc in the group key), unit price = extendedprice/quantity;
    VWAP rides exact DECIMAL price*qty and qty sums, TWAP averages
    the per-day 12dp DECIMAL mean prices.  Month-bounded output."""
    li = load(spark, sf_dir, "lineitem").select(
        F.expr(
            "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
        ).alias("ed"),
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        "l_quantity",
        "l_extendedprice",
    )
    up = F.col("l_extendedprice") / F.col("l_quantity")
    daily = li.groupBy("month", "ed").agg(
        F.round(
            F.sum(F.round(up, 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            12,
        )
        .cast("decimal(38,12)")
        .alias("day_mean"),
    )
    twap = daily.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum("day_mean").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("twap"),
    )
    vwap = li.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice"), 2).cast("decimal(28,2)")
            ).cast("double")
            / F.sum(
                F.round(F.col("l_quantity"), 2).cast("decimal(28,2)")
            ).cast("double"),
            6,
        ).alias("vwap"),
    )
    return (
        vwap.join(twap, "month")
        .select(
            "month",
            "n_lines",
            "n_days",
            "vwap",
            "twap",
            F.round(F.col("vwap") / F.col("twap"), 6).alias("vwap_over_twap"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Batch 151: modularity of the brand partition + Atkinson inequality
# ---------------------------------------------------------------------------


def modularity_brand_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-order part graph under the p_brand
    community partition — the quality score the LPA/k-core family never
    reports: per community c, Q_c = L_c/m − (d_c/2m)², with L_c the
    intra-community undirected edge count, d_c the community degree
    sum, m the undirected edge total; Σ_c Q_c is the graph's
    modularity.  All sufficient statistics are exact BIGINTs off the
    shared support-pruned edge builder; the final contribution is one
    fixed IEEE chain.  Brand-bounded output, graph-sized joins only."""
    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    lab = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("comm")
    )
    e2 = (
        edges.join(
            lab.select(
                F.col("node").alias("pa"), F.col("comm").alias("ca")
            ),
            "pa",
        ).join(
            lab.select(
                F.col("node").alias("pb"), F.col("comm").alias("cb")
            ),
            "pb",
        )
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    adj = e2.select(
        F.col("pa").alias("node"), F.col("ca").alias("comm")
    ).unionAll(e2.select(F.col("pb").alias("node"), F.col("cb").alias("comm")))
    deg = (
        adj.groupBy("node", "comm")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .groupBy("comm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("deg_sum"),
        )
    )
    intra = (
        e2.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    mD = F.col("m").cast("double")
    frac = F.col("deg_sum").cast("double") / (F.lit(2.0) * mD)
    return (
        deg.join(intra, "comm", "left")
        .withColumn(
            "intra_edges", F.coalesce(F.col("intra_edges"), F.lit(0))
        )
        .crossJoin(F.broadcast(m))
        .select(
            F.col("comm").alias("p_brand"),
            "n_nodes",
            "deg_sum",
            "intra_edges",
            F.round(
                F.col("intra_edges").cast("double") / mD - frac * frac, 6
            ).alias("contribution"),
        )
        .orderBy("p_brand")
    )


def atkinson_index_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (ε = 0.5) of order revenue per customer
    market segment — the welfare-theoretic member of the inequality
    family (Gini/Theil report dispersion; Atkinson reports the fraction
    of total income a society could give up and stay equally well off):
    A = 1 − EDE/mean with EDE = (mean √x)² at ε = ½.  √ is correctly
    rounded IEEE in both engines; √x rides 6dp DECIMAL sums, x rides
    exact 2dp DECIMAL sums; the final index is one float chain.
    Segment-bounded output, one join + one groupBy."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    g = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice"), 2).cast("decimal(28,2)")
            ).alias("s1"),
            F.sum(
                F.round(F.sqrt(F.col("o_totalprice")), 6).cast(
                    "decimal(28,6)"
                )
            ).alias("sh"),
        )
    )
    nD = F.col("n_orders").cast("double")
    mean = F.col("s1").cast("double") / nD
    msq = F.col("sh").cast("double") / nD
    ede = msq * msq
    return g.select(
        "c_mktsegment",
        "n_orders",
        F.round(mean, 6).alias("mean_price"),
        F.round(ede, 6).alias("ede_price"),
        F.round(F.lit(1.0) - ede / mean, 6).alias("atkinson_05"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Batch 152: rendezvous hashing balance + Palma ratio
# ---------------------------------------------------------------------------

RVH_NODES = 8  # baseline node count; the remap probe adds node 8


def rendezvous_hash_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing balance audit — the
    stateless shard-placement rule consistent-ring designs compete
    with (Thaler & Ravishankar 1998, public): each key goes to the
    node with the largest md5('rvh:'||node||':'||key) weight, and when
    a 9th node joins, exactly the keys whose new weight tops the old
    maximum move — HRW's minimal-disruption guarantee, measured here
    per node.  The argmax is the pure-integer max of enc = h*16+node
    (52-bit h, injective, deterministic under any tie), one groupBy
    over keys x 9 literal nodes.  Node-bounded output."""
    keys = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    )
    pairs = keys.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(RVH_NODES))).alias("node"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("rvh:"),
                    F.col("node").cast("string"),
                    F.lit(":"),
                    F.col("key").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    enc = h * F.lit(16) + F.col("node")
    g = pairs.groupBy("key").agg(
        F.max(F.when(F.col("node") < RVH_NODES, enc)).alias("e8"),
        F.max(enc).alias("e9"),
    )
    assigned = g.select(
        F.pmod(F.col("e8"), F.lit(16)).cast("long").alias("node"),
        (F.pmod(F.col("e9"), F.lit(16)) == RVH_NODES)
        .cast("long")
        .alias("moved"),
    )
    per = assigned.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("moved").cast("long").alias("n_moved"),
    )
    tot = keys.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "node",
            "n_keys",
            F.round(
                F.col("n_keys").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("share"),
            "n_moved",
            F.round(
                F.col("n_moved").cast("double")
                / F.col("n_keys").cast("double"),
                6,
            ).alias("moved_frac"),
        )
        .orderBy("node")
    )


def palma_ratio_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio of order revenue per customer nation — the
    inequality headline the decile tables imply but never state
    (Palma 2011, public): revenue captured by the top 10% of orders
    over revenue captured by the bottom 40%, with count cuts pinned to
    integer arithmetic (top = n − (9n div 10), bottom = 4n div 10) and
    membership decided on the (price, orderkey) total order so ties
    never flip the sets.  Revenue rides exact 2dp DECIMAL sums; one
    shuffle for the two per-nation rank windows.  Nation-bounded."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    j = o.join(c, "o_custkey").join(F.broadcast(n), "c_nationkey")
    wd = Window.partitionBy("n_name").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wa = Window.partitionBy("n_name").orderBy(
        F.asc("o_totalprice"), F.desc("o_orderkey")
    )
    r = j.select(
        "n_name",
        F.round(F.col("o_totalprice"), 2)
        .cast("decimal(28,2)")
        .alias("price"),
        F.row_number().over(wd).alias("rd"),
        F.row_number().over(wa).alias("ra"),
    )
    cnt = j.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    cut = cnt.select(
        "n_name",
        "n_orders",
        (F.col("n_orders") - F.expr("(9 * n_orders) div 10"))
        .cast("long")
        .alias("t_cut"),
        F.expr("(4 * n_orders) div 10").cast("long").alias("b_cut"),
    )
    m = r.join(F.broadcast(cut), "n_name")
    agg = m.groupBy("n_name").agg(
        F.first("n_orders").alias("n_orders"),
        F.first("t_cut").alias("top10_n"),
        F.first("b_cut").alias("bottom40_n"),
        F.sum(F.when(F.col("rd") <= F.col("t_cut"), F.col("price"))).alias(
            "ts"
        ),
        F.sum(F.when(F.col("ra") <= F.col("b_cut"), F.col("price"))).alias(
            "bs"
        ),
    )
    return agg.select(
        "n_name",
        "n_orders",
        "top10_n",
        "bottom40_n",
        F.col("ts").cast("double").alias("top10_revenue"),
        F.col("bs").cast("double").alias("bottom40_revenue"),
        F.round(
            F.col("ts").cast("double") / F.col("bs").cast("double"), 6
        ).alias("palma_ratio"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# Batch 157: consistent-hash ring balance
# ---------------------------------------------------------------------------

RING_NODES = 8
RING_VNODES = 16


def consistent_ring_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring balance audit — the stateful-ring
    counterpart of rendezvous_hash_balance (Karger et al. 1997,
    public): 8 nodes x 16 virtual nodes hash onto a 52-bit ring, each
    key goes to its successor vnode (wrap to the ring minimum), and
    the per-node key share measures how well 16 vnodes smooth the arc
    lengths.  The successor argmin is the injective min(vh*16+node)
    over vnodes clockwise of the key; all md5 integers, one
    keys x 128 join filtered to the successor arc.  Node-bounded
    output."""
    keys = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("key:"), F.col("o_orderkey").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("kh"),
    )
    ring = (
        spark.range(RING_NODES)
        .select(F.col("id").cast("int").alias("node"))
        .select(
            "node",
            F.explode(
                F.sequence(F.lit(0), F.lit(RING_VNODES - 1))
            ).alias("rep"),
        )
        .select(
            "node",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ring:"),
                                F.col("node").cast("string"),
                                F.lit(":"),
                                F.col("rep").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                * 16
                + F.col("node")
            ).alias("enc"),
        )
    )
    wrap = ring.agg(F.min("enc").alias("wrap_enc"))
    succ = (
        keys.crossJoin(F.broadcast(ring))
        .filter(F.expr("enc div 16") >= F.col("kh"))
        .groupBy("key")
        .agg(F.min("enc").alias("senc"))
    )
    assigned = (
        keys.join(succ, "key", "left")
        .crossJoin(F.broadcast(wrap))
        .select(
            F.pmod(
                F.coalesce(F.col("senc"), F.col("wrap_enc")), F.lit(16)
            ).cast("long").alias("node")
        )
    )
    tot = keys.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        assigned.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.lit(RING_VNODES).cast("long").alias("n_vnodes"),
            "n_keys",
            F.round(
                F.col("n_keys").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Batch 158: Laspeyres / Paasche / Fisher price indices
# ---------------------------------------------------------------------------


def price_index_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher ideal price indices between the
    first and last ship months over the parts traded in BOTH — the
    index-number trio (Fisher 1922, public) the VWAP/TWAP pair leads
    into: per-part unit prices p = round(Σ value / Σ qty, 6) off
    exact 2dp DECIMAL sums, index terms p·q rounded 6dp into
    DECIMAL(38,6) sums, L = Σp1q0/Σp0q0, P = Σp1q1/Σp0q1,
    F = sqrt(LP).  Month endpoints are min/max of the month key;
    part-bounded joins.  One row."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.round(F.col("l_quantity"), 2).cast("decimal(28,2)").alias("q"),
        F.round(F.col("l_extendedprice"), 2)
        .cast("decimal(28,2)")
        .alias("v"),
    )
    mm = li.agg(F.min("month").alias("m0"), F.max("month").alias("m1"))
    per = (
        li.crossJoin(F.broadcast(mm))
        .filter((F.col("month") == F.col("m0")) | (F.col("month") == F.col("m1")))
        .groupBy("l_partkey", "month", "m0", "m1")
        .agg(F.sum("q").alias("qs"), F.sum("v").alias("vs"))
        .select(
            "l_partkey",
            "month",
            "m0",
            "m1",
            F.col("qs").cast("double").alias("qd"),
            F.round(
                F.col("vs").cast("double") / F.col("qs").cast("double"), 6
            ).alias("p"),
        )
    )
    a = per.filter(F.col("month") == F.col("m0")).select(
        "l_partkey",
        "m0",
        "m1",
        F.col("qd").alias("q0"),
        F.col("p").alias("p0"),
    )
    b = per.filter(F.col("month") == F.col("m1")).select(
        "l_partkey", F.col("qd").alias("q1"), F.col("p").alias("p1")
    )
    j = a.join(b, "l_partkey")
    terms = j.select(
        "m0",
        "m1",
        F.round(F.col("p1") * F.col("q0"), 6)
        .cast("decimal(38,6)")
        .alias("p1q0"),
        F.round(F.col("p0") * F.col("q0"), 6)
        .cast("decimal(38,6)")
        .alias("p0q0"),
        F.round(F.col("p1") * F.col("q1"), 6)
        .cast("decimal(38,6)")
        .alias("p1q1"),
        F.round(F.col("p0") * F.col("q1"), 6)
        .cast("decimal(38,6)")
        .alias("p0q1"),
    )
    agg = terms.groupBy("m0", "m1").agg(
        F.count(F.lit(1)).cast("long").alias("n_common_parts"),
        F.sum("p1q0").cast("double").alias("s10"),
        F.sum("p0q0").cast("double").alias("s00"),
        F.sum("p1q1").cast("double").alias("s11"),
        F.sum("p0q1").cast("double").alias("s01"),
    )
    lasp = F.col("s10") / F.col("s00")
    paas = F.col("s11") / F.col("s01")
    return agg.select(
        F.col("m0").alias("month0"),
        F.col("m1").alias("month1"),
        "n_common_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Batch 160: deletion-vector plan
# ---------------------------------------------------------------------------

DV_FILE_ROWS = 8192  # pinned rows per data file
DV_ROW_BYTES = 100  # pinned serialized row cost for the rewrite side
DV_HDR = 8
DV_BITMAP_BYTES = 1024  # 8192 rows of bitmap


def deletion_vector_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector vs copy-on-write rewrite plan — the per-file
    decision a Delta/Iceberg merge-on-read table makes when deletes
    land (public format docs): orders are packed 8192/file by key
    range, deletes are the oldest quartile of the date span (integer
    cutoff arithmetic), a file's DV costs 8 + min(2·n_del, 1024)
    bytes (array-or-bitmap, the roaring container rule at file
    granularity) while a rewrite costs 100 B per surviving row; each
    touched file takes whichever is cheaper, untouched files are
    free.  Pure-integer model over file-bounded groups."""
    o = load(spark, sf_dir, "orders").select(
        F.expr("o_orderkey div 8192").alias("file_id"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("ed"),
    )
    span = o.agg(F.min("ed").alias("d0"), F.max("ed").alias("d1"))
    cut = span.select(
        (F.col("d0") + F.expr("(d1 - d0) div 4")).alias("cutoff")
    )
    per = (
        o.crossJoin(F.broadcast(cut))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("ed") < F.col("cutoff"), 1).otherwise(0))
            .cast("long")
            .alias("n_del"),
        )
    )
    dvb = F.lit(DV_HDR) + F.least(
        2 * F.col("n_del"), F.lit(DV_BITMAP_BYTES)
    )
    rwb = F.lit(DV_ROW_BYTES) * (F.col("n_rows") - F.col("n_del"))
    sized = per.select(
        "n_rows",
        "n_del",
        F.when(F.col("n_del") == 0, F.lit("clean"))
        .when(dvb < rwb, F.lit("dv"))
        .otherwise(F.lit("rewrite"))
        .alias("action"),
        F.when((F.col("n_del") > 0) & (dvb < rwb), dvb)
        .otherwise(0)
        .cast("long")
        .alias("dv_bytes"),
        F.when((F.col("n_del") > 0) & ~(dvb < rwb), rwb)
        .otherwise(0)
        .cast("long")
        .alias("rw_bytes"),
    )
    return sized.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(F.col("action") == "clean", 1).otherwise(0))
        .cast("long")
        .alias("files_clean"),
        F.sum(F.when(F.col("action") == "dv", 1).otherwise(0))
        .cast("long")
        .alias("files_dv"),
        F.sum(F.when(F.col("action") == "rewrite", 1).otherwise(0))
        .cast("long")
        .alias("files_rewrite"),
        F.sum("n_del").cast("long").alias("rows_deleted"),
        F.sum("dv_bytes").cast("long").alias("dv_bytes_total"),
        F.sum("rw_bytes").cast("long").alias("rewrite_bytes_total"),
    )


# ---------------------------------------------------------------------------
# Batch 171: partition evolution plan
# ---------------------------------------------------------------------------


def partition_evolution_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-evolution cost model — the day-grain vs month-grain
    layout decision an Iceberg partition-spec evolution weighs
    (public format docs): with one file per non-empty partition,
    day grain yields many small files (the classic small-file
    problem) and a one-month query touches every day file in range,
    while month grain touches one.  Reports file counts, average
    rows per file at each grain, and the mean files-touched for a
    month query under both specs.  Pure-integer aggregates."""
    o = load(spark, sf_dir, "orders").select(
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("ed"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    day = o.groupBy("month", "ed").agg(
        F.count(F.lit(1)).cast("long").alias("rows")
    )
    mon = day.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("day_files"),
        F.sum("rows").cast("long").alias("rows"),
    )
    agg = mon.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("day_files").cast("long").alias("day_files_total"),
        F.sum("rows").cast("long").alias("n_rows"),
    )
    return agg.select(
        "n_months",
        F.col("day_files_total").alias("day_grain_files"),
        F.col("n_months").alias("month_grain_files"),
        "n_rows",
        F.round(
            F.col("n_rows").cast("double")
            / F.col("day_files_total").cast("double"),
            6,
        ).alias("avg_rows_per_day_file"),
        F.round(
            F.col("n_rows").cast("double")
            / F.col("n_months").cast("double"),
            6,
        ).alias("avg_rows_per_month_file"),
        F.round(
            F.col("day_files_total").cast("double")
            / F.col("n_months").cast("double"),
            6,
        ).alias("files_touched_month_query_day_grain"),
        F.lit(1.0).alias("files_touched_month_query_month_grain"),
    )


# ---------------------------------------------------------------------------
# Batch 178: net revenue retention, edge triangle support
# ---------------------------------------------------------------------------


def net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month net and gross revenue retention — the SaaS
    cohort headline (public metric): for each month pair (m−1, m),
    NRR = revenue in m from customers who spent in m−1 over their
    m−1 revenue (expansion counts), GRR caps each returning customer
    at their prior spend (contraction only).  Exact 2dp DECIMAL
    revenue; month-pair-bounded rows."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice"), 2).cast("decimal(28,2)").alias("v"),
    )
    per = o.groupBy("o_custkey", "month").agg(F.sum("v").alias("rev"))
    months = per.select("month").distinct()
    nxt = months.select(
        F.col("month").alias("m0"),
        F.date_format(
            F.add_months(F.to_date(F.concat(F.col("month"), F.lit("-01"))), 1),
            "yyyy-MM",
        ).alias("m1"),
    ).join(
        months.select(F.col("month").alias("m1")), "m1"
    )
    base = per.select(
        F.col("o_custkey").alias("ck"),
        F.col("month").alias("m0"),
        F.col("rev").alias("rev0"),
    )
    cur = per.select(
        F.col("o_custkey").alias("ck"),
        F.col("month").alias("m1"),
        F.col("rev").alias("rev1"),
    )
    j = (
        nxt.join(base, "m0")
        .join(cur, ["m1", "ck"], "left")
        .withColumn(
            "rev1", F.coalesce(F.col("rev1"), F.lit(0).cast("decimal(38,2)"))
        )
    )
    agg = j.groupBy("m0", "m1").agg(
        F.count(F.lit(1)).cast("long").alias("n_base_customers"),
        F.sum(F.when(F.col("rev1") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum("rev0").alias("base_rev"),
        F.sum("rev1").alias("ret_rev"),
        F.sum(F.least(F.col("rev0"), F.col("rev1"))).alias("capped_rev"),
    )
    return agg.select(
        F.col("m0").alias("month_base"),
        F.col("m1").alias("month_next"),
        "n_base_customers",
        "n_retained",
        F.round(
            F.col("ret_rev").cast("double")
            / F.col("base_rev").cast("double"),
            6,
        ).alias("nrr"),
        F.round(
            F.col("capped_rev").cast("double")
            / F.col("base_rev").cast("double"),
            6,
        ).alias("grr"),
    ).orderBy("month_base")


def edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge triangle-support histogram and 3-truss size of the
    co-order part graph — the k-truss vocabulary (Cohen 2008, public)
    above affinity_triangles' global count: each edge's support = the
    number of triangles through it (one wedge join against the shared
    edge set), histogrammed, with the 3-truss (support >= 1) edge
    count.  Support-pruned edges only; triangle-join-bounded."""
    edges = _coorder_edges(spark, sf_dir).localCheckpoint()
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tris = wedges.join(e3, ["a", "c"]).select("a", "b", "c")
    sup = (
        tris.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(tris.select(F.col("b"), F.col("c")))
        .unionAll(tris.select(F.col("a"), F.col("c")))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    alle = edges.select(
        F.col("pa").alias("x"), F.col("pb").alias("y")
    ).join(sup, ["x", "y"], "left").withColumn(
        "support", F.coalesce(F.col("support"), F.lit(0))
    )
    hist = alle.groupBy("support").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    truss = alle.agg(
        F.sum(F.when(F.col("support") >= 1, 1).otherwise(0))
        .cast("long")
        .alias("truss3_edges"),
        F.count(F.lit(1)).cast("long").alias("total_edges"),
    )
    return (
        hist.crossJoin(F.broadcast(truss))
        .select(
            "support", "n_edges", "total_edges", "truss3_edges"
        )
        .orderBy("support")
    )


# ---------------------------------------------------------------------------
# Batch 181: regression discontinuity, retention decay, ABC classes
# ---------------------------------------------------------------------------

RD_CUTOFF = 250000.0  # pinned running-variable cutoff
RD_BANDWIDTH = 100000.0


def regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate at a pinned order-value
    cutoff — the local-linear jump estimator (Thistlethwaite &
    Campbell 1960, public) run as a CALIBRATION check (no real
    treatment exists at 250k, so the honest estimate is ~0): within
    the ±100k bandwidth, separate OLS lines left and right of the
    cutoff on the lineitem count per order, RD effect = the gap
    between the two intercepts evaluated AT the cutoff.  Exact
    integer outcomes; centered running variable; one row."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).cast("double").alias("x"),
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    j = (
        o.join(li, "o_orderkey")
        .filter(
            (F.col("x") >= RD_CUTOFF - RD_BANDWIDTH)
            & (F.col("x") < RD_CUTOFF + RD_BANDWIDTH)
        )
        .select(
            (F.col("x") >= RD_CUTOFF).cast("int").alias("side"),
            F.round(
                (F.col("x") - F.lit(RD_CUTOFF)) / F.lit(RD_BANDWIDTH), 12
            ).alias("u"),
            F.col("y").cast("double").alias("y"),
        )
    )
    mom = j.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("u").cast("decimal(38,12)")).cast("double").alias("su"),
        F.sum(
            F.round(F.col("u") * F.col("u"), 12).cast("decimal(38,12)")
        ).cast("double").alias("suu"),
        F.sum(F.col("y").cast("decimal(38,2)")).cast("double").alias("sy"),
        F.sum(
            F.round(F.col("u") * F.col("y"), 12).cast("decimal(38,12)")
        ).cast("double").alias("suy"),
    )
    nD = F.col("n").cast("double")
    slope = (nD * F.col("suy") - F.col("su") * F.col("sy")) / (
        nD * F.col("suu") - F.col("su") * F.col("su")
    )
    intercept = (F.col("sy") - slope * F.col("su")) / nD
    per = mom.select(
        "side",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept_at_cutoff"),
    )
    lft = per.filter(F.col("side") == 0).select(
        F.col("n").alias("n_left"),
        F.col("slope").alias("slope_left"),
        F.col("intercept_at_cutoff").alias("icpt_left"),
    )
    rgt = per.filter(F.col("side") == 1).select(
        F.col("n").alias("n_right"),
        F.col("slope").alias("slope_right"),
        F.col("intercept_at_cutoff").alias("icpt_right"),
    )
    return lft.crossJoin(rgt).select(
        "n_left",
        "n_right",
        "slope_left",
        "slope_right",
        F.col("icpt_left").alias("intercept_left"),
        F.col("icpt_right").alias("intercept_right"),
        F.round(
            F.col("icpt_right") - F.col("icpt_left"), 6
        ).alias("rd_effect"),
    )


def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential decay fit to the weekly user-retention curve —
    retention_cohorts' table compressed to its half-life (public
    growth-analytics convention): pooled retention rate at each week
    offset (users active in their signup week AND week w over
    signup-week users, offsets = epoch-day div 7 deltas), ln-OLS of
    rate on offset w >= 1, half-life = −ln 2 / slope.  Exact integer
    cohort counts; offset-bounded rows folded to one."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 div 7"
        ).alias("wk"),
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("wk").alias("w0"))
    act = ev.join(first, "user_id").select(
        "user_id", (F.col("wk") - F.col("w0")).alias("off")
    )
    base = first.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    per = (
        act.filter(F.col("off") >= 1)
        .groupBy("off")
        .agg(F.countDistinct("user_id").cast("long").alias("active"))
    )
    pts = per.crossJoin(F.broadcast(base)).select(
        "off",
        F.round(
            F.log(
                F.col("active").cast("double")
                / F.col("n_users").cast("double")
            ),
            12,
        ).alias("w"),
        F.col("off").cast("double").alias("u"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("u").cast("decimal(38,6)")).cast("double").alias("su"),
        F.sum(F.col("w").cast("decimal(38,12)")).cast("double").alias("sw"),
        F.sum(
            F.round(F.col("u") * F.col("w"), 12).cast("decimal(38,12)")
        ).cast("double").alias("suw"),
        F.sum(
            F.round(F.col("u") * F.col("u"), 6).cast("decimal(38,6)")
        ).cast("double").alias("suu"),
    )
    kD = F.col("k").cast("double")
    dxx = kD * F.col("suu") - F.col("su") * F.col("su")
    slope = F.when(
        dxx != 0,
        (kD * F.col("suw") - F.col("su") * F.col("sw")) / dxx,
    )
    icpt = (F.col("sw") - slope * F.col("su")) / kD
    # an always-on synthetic stream can make retention flat (slope 0)
    # or leave a single offset (dxx 0): honest NULLs in both cases
    return s.select(
        F.col("k").alias("n_week_offsets"),
        F.round(slope, 6).alias("decay_slope"),
        F.round(F.exp(icpt), 6).alias("week1_level"),
        F.round(
            F.when(slope < 0, -F.lit(0.6931471805599453) / slope), 6
        ).alias("half_life_weeks"),
    )


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue — the 80/15/5
    Pareto ladder (public operations classic) pareto_share_curve's
    deciles imply but never label: parts ranked by exact DECIMAL
    revenue (ties by key), class A until cumulative share crosses
    80%, B until 95%, C after; per-class part counts, part share,
    and revenue share.  Rank windows over part-bounded rows."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice"), 2)
        .cast("decimal(28,2)")
        .alias("rev"),
    )
    per = li.groupBy("l_partkey").agg(F.sum("rev").alias("rev"))
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("rev").alias("t"),
    )
    wo = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "rev",
        "np",
        "t",
        F.sum("rev").over(wo).alias("cum"),
    )
    # class decided on the cumulative share INCLUDING the part
    share = F.col("cum").cast("double") / F.col("t").cast("double")
    classed = ranked.select(
        "rev",
        "np",
        "t",
        F.when(share <= 0.80, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").alias("class_rev"),
            F.first("np").alias("np"),
            F.first("t").alias("t"),
        )
        .select(
            "abc",
            "n_parts",
            F.round(
                F.col("n_parts").cast("double")
                / F.col("np").cast("double"),
                6,
            ).alias("part_share"),
            F.round(
                F.col("class_rev").cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# Batch 183: Weibull plot, extremal index, price dispersion
# ---------------------------------------------------------------------------


def weibull_plot_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull probability-plot fit to the pooled within-user
    inter-event gaps — the reliability-engineering shape/scale read
    (public median-rank regression): gaps sorted ascending with
    Benard's median ranks p = (i − 0.3)/(n + 0.4), OLS of
    ln(−ln(1 − p)) on ln(gap); shape k = slope (k < 1 means
    burst-prone 'infant mortality' arrivals, the Goh-Barabasi story
    in Weibull clothes), scale λ = exp(−intercept/k).  Zero gaps
    (same-microsecond events) are excluded from the log plot
    (documented).  One rank window + 12dp DECIMAL OLS sums."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select((F.col("us") - F.lag("us").over(w)).alias("g"))
        .filter(F.col("g").isNotNull() & (F.col("g") > 0))
    )
    from lucene_mapreduce_spark.operators.parity import distributed_row_number

    n = gaps.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # distributed global rank (ADVICE r4): range-partitioned + offset, no
    # single-partition window; the plotting sums are tie-block invariant
    ranked = distributed_row_number(gaps, "g", "i").crossJoin(
        F.broadcast(n)
    ).select("g", "n", "i")
    pts = ranked.select(
        "n",
        F.round(F.log(F.col("g").cast("double")), 12).alias("u"),
        F.round(
            F.log(
                -F.log(
                    F.lit(1.0)
                    - (F.col("i").cast("double") - 0.3)
                    / (F.col("n").cast("double") + 0.4)
                )
            ),
            12,
        ).alias("y"),
    )
    s = pts.groupBy("n").agg(
        F.sum(F.col("u").cast("decimal(38,12)")).cast("double").alias("su"),
        F.sum(F.col("y").cast("decimal(38,12)")).cast("double").alias("sy"),
        F.sum(
            F.round(F.col("u") * F.col("y"), 12).cast("decimal(38,12)")
        ).cast("double").alias("suy"),
        F.sum(
            F.round(F.col("u") * F.col("u"), 12).cast("decimal(38,12)")
        ).cast("double").alias("suu"),
    )
    nD = F.col("n").cast("double")
    k = (nD * F.col("suy") - F.col("su") * F.col("sy")) / (
        nD * F.col("suu") - F.col("su") * F.col("su")
    )
    icpt = (F.col("sy") - k * F.col("su")) / nD
    return s.select(
        F.col("n").alias("n_gaps"),
        F.round(k, 6).alias("weibull_shape_k"),
        F.round(F.exp(-icpt / k), 6).alias("weibull_scale_us"),
        (k < 1).cast("int").alias("bursty"),
    )


EXTREMAL_RUN_GAP = 2  # days of quiet that split exceedance clusters


def extremal_index_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extremal index by the runs declustering estimator — how much
    do daily-count extremes CLUSTER? (Smith & Weissman 1994, public;
    θ = 1 means isolated spikes, θ → 0 long storms — the
    serial-dependence companion of gpd_pot_fit's marginal tail):
    exceedances over the exact type-7 p90 of the gap-filled series,
    clusters split by > 2 quiet days, θ̂ = clusters/exceedances.
    One window pass."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "ed"
        )
    )
    span = ev.agg(F.min("ed").alias("d0"), F.max("ed").alias("d1"))
    days = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("ed")
    )
    counts = ev.groupBy("ed").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cal = days.join(counts, "ed", "left").select(
        "ed", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    thr = cal.agg(F.expr("percentile(c, 0.9)").alias("u"))
    exc = (
        cal.crossJoin(F.broadcast(thr))
        .filter(F.col("c").cast("double") > F.col("u"))
        .select("ed", F.round("u", 6).alias("u"))
    )
    w = Window.orderBy("ed")
    marks = exc.select(
        "ed",
        "u",
        F.when(
            F.lag("ed").over(w).isNull()
            | (F.col("ed") - F.lag("ed").over(w) > EXTREMAL_RUN_GAP),
            1,
        )
        .otherwise(0)
        .alias("new_cluster"),
    )
    agg = marks.agg(
        F.count(F.lit(1)).cast("long").alias("n_exceedances"),
        F.sum("new_cluster").cast("long").alias("n_clusters"),
        F.first("u").alias("threshold"),
    )
    return agg.select(
        "threshold",
        "n_exceedances",
        "n_clusters",
        F.round(
            F.col("n_clusters").cast("double")
            / F.col("n_exceedances").cast("double"),
            6,
        ).alias("extremal_index"),
    )


PRICE_DISP_MIN_LINES = 5
PRICE_DISP_K = 10


def unit_price_dispersion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion league table — the parts whose realized
    price varies most across lines (price-consistency audit; the
    per-part CV of extendedprice/quantity): parts with >= 5 lines,
    CV from 12dp DECIMAL moment sums, top-10 by (rounded CV desc,
    part asc).  Part-bounded output."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(
            F.col("l_extendedprice") / F.col("l_quantity"), 6
        ).alias("up"),
    )
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(
            F.round(F.col("up"), 12).cast("decimal(38,12)")
        ).alias("s1"),
        F.sum(
            F.round(F.col("up") * F.col("up"), 12).cast("decimal(38,12)")
        ).alias("s2"),
    ).filter(F.col("n_lines") >= PRICE_DISP_MIN_LINES)
    nD = F.col("n_lines").cast("double")
    mean = F.col("s1").cast("double") / nD
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * mean)
        / (nD - 1)
    )
    scored = per.select(
        "l_partkey",
        "n_lines",
        F.round(mean, 6).alias("mean_unit_price"),
        F.round(sd / mean, 6).alias("cv"),
    )
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    return ranked_topk(
        scored, [F.desc("cv"), F.asc("l_partkey")], PRICE_DISP_K
    ).select("rank", "l_partkey", "n_lines", "mean_unit_price", "cv")


# ---------------------------------------------------------------------------
# Batch 185: Benford mantissa arc, inter-order gaps, single-source risk
# ---------------------------------------------------------------------------

_INV_LN10 = 0.43429448190325176  # shared literal 1/ln 10
_TWO_PI = 6.283185307179586


def benford_mantissa_arc_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford mantissa arc test — the circular-statistics summary of
    the WHOLE significand distribution (Alexander 2009, public),
    stronger than the first/second-digit chi-squares already in the
    family: each price maps to the unit circle at angle 2π·frac(log10
    v), and under Benford the mean vector length L ≈ 0 with
    p = exp(−n L²).  log10 via ln·(1/ln 10) literal; cos/sin are
    engine-shared chains; components fold as 12dp DECIMAL.  One
    row."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("v")
    ).filter(F.col("v") > 0)
    lg = F.round(F.log(F.col("v")) * F.lit(_INV_LN10), 12)
    frac = lg - F.floor(lg)
    ang = F.lit(_TWO_PI) * frac
    comp = o.select(
        F.round(F.cos(ang), 12).cast("decimal(38,12)").alias("cx"),
        F.round(F.sin(ang), 12).cast("decimal(38,12)").alias("cy"),
    )
    agg = comp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cx").cast("double").alias("sx"),
        F.sum("cy").cast("double").alias("sy"),
    )
    nD = F.col("n").cast("double")
    xb = F.col("sx") / nD
    yb = F.col("sy") / nD
    l2 = xb * xb + yb * yb
    return agg.select(
        "n",
        F.round(xb, 6).alias("mean_cos"),
        F.round(yb, 6).alias("mean_sin"),
        F.round(F.sqrt(l2), 6).alias("vector_length"),
        F.round(F.exp(-nD * l2), 6).alias("arc_test_p"),
    )


def interorder_gap_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled inter-order gap regularity — the customer-cadence twin
    of the event-stream burstiness family, on ORDER dates: per-
    customer consecutive order-day gaps pooled (exact BIGINT moments),
    CV of the gap distribution and the Goh-Barabasi B = (cv−1)/(cv+1)
    read on purchasing rhythm (B < 0 regular subscribers, ~0 Poisson,
    > 0 bursty).  One lag window, one row."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("ed"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("ed", "o_orderkey")
    gaps = (
        o.select((F.col("ed") - F.lag("ed").over(w)).alias("g"))
        .filter(F.col("g").isNotNull())
    )
    mom = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("s1"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
    )
    nD = F.col("n_gaps").cast("double")
    mean = F.col("s1").cast("double") / nD
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * mean)
        / (nD - 1)
    )
    cv = sd / mean
    return mom.select(
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_days"),
        F.round(sd, 6).alias("sd_gap_days"),
        F.round(cv, 6).alias("cv"),
        F.round((cv - 1) / (cv + 1), 6).alias("burstiness_b"),
    )


def single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply-risk histogram — how many parts depend on
    one supplier? (the procurement-risk readout Q16's brand counts
    sidestep): per part the distinct supplier count and the TOP
    supplier's share of shipped quantity (exact DECIMAL sums; the share
    needs only the max, so supplier ties are moot), histogrammed by supplier count with the mean
    top-share per bucket.  Part-bounded rollups."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity"), 2).cast("decimal(28,2)").alias("q"),
    )
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("q").alias("qs")
    )
    tot = per.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("qs").alias("qt"),
        F.max("qs").alias("qmax"),
    )
    share = F.col("qmax").cast("double") / F.col("qt").cast("double")
    rows = tot.select(
        "n_suppliers",
        F.round(share, 12).alias("top_share"),
    )
    return (
        rows.groupBy("n_suppliers")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum(
                    F.round(F.col("top_share"), 12).cast("decimal(38,12)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_top_share"),
        )
        .orderBy("n_suppliers")
    )
