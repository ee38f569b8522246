"""Driver contract: queries() + oracle_sql() pairs over the testdata
tables, mapping every operator family from SURVEY.md §2 plus the
training-data pipeline ops onto DuckDB-checkable queries.

Float discipline for hash-stable comparison:
- money/value aggregates are integerized BEFORE summing
  (sum(round(x·100)) as BIGINT cents) — double-sum order is
  nondeterministic in both engines, integer sums are exact;
- per-row float math is rounded (identical op sequence → identical
  IEEE doubles in both engines);
- computed integer columns are cast to BIGINT on the Spark side to
  match DuckDB's BIGINT-by-default.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapcrawler_spark.operators import image_dedup as _imgdedup
from snapcrawler_spark.operators import graph as _graph
from snapcrawler_spark.pipeline import ann as _ann
from snapcrawler_spark.pipeline import corpus as _corpus
from snapcrawler_spark.pipeline import decontaminate as _decon
from snapcrawler_spark.pipeline import dedup as _dedup
from snapcrawler_spark.pipeline import text as _text


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# §2.1/2.2 scans, projections, filters (predicate pushdown showcase)
# ---------------------------------------------------------------------------

def q_scan_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            _cents(F.col("l_quantity")).alias("qty_cents"),
        )
    )


def q_filter_chain(spark, sf_dir):
    """Multi-predicate ordered filter chain (image filter-chain shape:
    cheap predicates composed, filtering_module.py:267-356)."""
    p = _t(spark, sf_dir, "part")
    ratio = F.col("p_retailprice") / F.col("p_size")
    return (
        p.where(F.col("p_size").between(5, 40))
        .where(F.lower(F.col("p_type")).contains("stand"))
        .where(ratio > 30)
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            _cents(F.col("p_retailprice")).alias("price_cents"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins / membership probes
# ---------------------------------------------------------------------------

def q_seen_anti_join(spark, sf_dir):
    """URL-seen-set shape: anti-join (customers with no finished order —
    every customer has SOME order in this testdata, so the unfiltered
    anti-join was vacuous)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_seen_semi_join(spark, sf_dir):
    """Membership probe (EXISTS): suppliers that ship >49-qty lines."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


def q_broadcast_join_agg(spark, sf_dir):
    """Small-dim broadcast join (robots-table shape): revenue by nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3/2.5 first-wins dedup windows (page-MD5 / pHash probes)
# ---------------------------------------------------------------------------

def q_first_wins_md5(spark, sf_dir):
    """Page-hash dedup shape: first doc (lowest doc_id) per content md5."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return (
        d.select("doc_id", "source", F.md5(F.col("text")).alias("content_md5"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "source", "content_md5")
    )


def q_politeness_topk(spark, sf_dir):
    """Per-host budget window: first 3 events per user by time."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", F.col("rn").cast("long").alias("rn"))
    )


def q_latest_wins_fold(spark, sf_dir):
    """Stats-fold shape (parallel_manager.py:124-144): latest event value
    per (user, type) by timestamp."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id",
            _cents(F.col("value")).alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations (counter shapes)
# ---------------------------------------------------------------------------

def q_counter_tally(spark, sf_dir):
    """Per-(host,status) tally shape: events by type."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


def q_per_depth_counts(spark, sf_dir):
    """Per-depth URL ledger shape: documents per (lang, source)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (scan→filter→groupBy partial-agg showcase)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count("*").alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + ordered top-10.

    Round 7 (guide §3.1): broadcast the SMALL side deliberately — the
    planner's post-filter size estimate put the date-filtered lineitem
    (~half the table) under the broadcast threshold and built a
    multi-million-row hash relation on the driver; the
    customer⋈orders subtree (segment × date filtered) is orders of
    magnitude smaller, and with it broadcast the lineitem scan streams
    map-side with no exchange before the aggregate."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .hint("broadcast")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.5/2.6 windows, sorts, top-k
# ---------------------------------------------------------------------------

def q_running_sum(spark, sf_dir):
    """Running frontier-size shape: cumulative order value per customer."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


def q_ordered_prefix_cap(spark, sf_dir):
    """max_requests cap shape: globally-first 100 orders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# §2.7 set ops (extraction-channel union shape)
# ---------------------------------------------------------------------------

def q_union_channels(spark, sf_dir):
    """8-channel extraction union shape (image_spider.py:165-235):
    distinct union of two 'channels' of user ids."""
    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("value") > 90).select("user_id")
    return a.union(b).distinct().withColumn("user_id", F.col("user_id"))


# ---------------------------------------------------------------------------
# §2.8 scalar functions (regexp / json / string)
# ---------------------------------------------------------------------------

def q_json_extract(spark, sf_dir):
    """Ajax-JSON extraction shape (middlewares.py:230-248): pull the
    numeric k field out of the props JSON."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ).where(F.col("k") > 80)


def q_string_kernels(spark, sf_dir):
    """URL-string kernel shape: lower/split/substring/md5 combo."""
    d = _t(spark, sf_dir, "documents")
    first_word = F.element_at(F.split(F.col("text"), " "), 1)
    return d.select(
        "doc_id",
        first_word.alias("first_word"),
        F.length("text").cast("long").alias("len"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("md5_prefix"),
    )


# ---------------------------------------------------------------------------
# §2.10 streaming-shaped (sessionization / tumbling windows)
# ---------------------------------------------------------------------------

def q_sessionize(spark, sf_dir):
    """Wave/batch iteration shape: gap-based sessions (>600s) per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer epochs in both engines (cast: parquet yields NTZ,
    # session TZ is pinned UTC so the cast is lossless)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 600 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


def q_tumbling_window(spark, sf_dir):
    """Per-wave metrics shape: hourly tumbling aggregation."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )


def q_sliding_window(spark, sf_dir):
    """Hopping-window aggregation (§2.10 streaming-shaped, the overlap
    variant of tumbling_window): Spark's built-in F.window with a
    30-minute slide over 1-hour windows — each event lands in exactly
    size/slide = 2 windows, grids epoch-aligned on both engines. The
    window start is emitted as epoch micros (TIMESTAMP_NTZ must be cast
    to timestamp before unix_micros under the pinned-UTC session)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window(
                F.col("ts").cast("timestamp"), "1 hour", "30 minutes"
            ).alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("win.start").cast("timestamp")).alias(
                "win_start_us"
            ),
            "event_type",
            "n",
            "value_cents",
        )
    )


def q_rollup_counts(spark, sf_dir):
    """Hierarchical lineage rollup (wave→host→total metrics shape)."""
    d = _t(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


def q_pivot_status(spark, sf_dir):
    """Per-(host,status) tally pivoted to columns (stats-matrix shape)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def q_except_set(spark, sf_dir):
    """EXCEPT ALL → distinct shape: users whose click count exceeds
    their purchase count (multiset difference, then distinct)."""
    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b).distinct()


def q_intersect_set(spark, sf_dir):
    """INTERSECT shape: users both clicking and purchasing."""
    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select("user_id")
    b = e.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl-operator shapes (SURVEY §2)
        "scan_filter": q_scan_filter,
        "filter_chain": q_filter_chain,
        "seen_anti_join": q_seen_anti_join,
        "seen_semi_join": q_seen_semi_join,
        "broadcast_join_agg": q_broadcast_join_agg,
        "first_wins_md5": q_first_wins_md5,
        "politeness_topk": q_politeness_topk,
        "latest_wins_fold": q_latest_wins_fold,
        "counter_tally": q_counter_tally,
        "per_depth_counts": q_per_depth_counts,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "running_sum": q_running_sum,
        "ordered_prefix_cap": q_ordered_prefix_cap,
        "union_channels": q_union_channels,
        "json_extract": q_json_extract,
        "string_kernels": q_string_kernels,
        "sessionize": q_sessionize,
        "tumbling_window": q_tumbling_window,
        "sliding_window": q_sliding_window,
        "rollup_counts": q_rollup_counts,
        "pivot_status": q_pivot_status,
        "except_set": q_except_set,
        "intersect_set": q_intersect_set,
        # training-data pipeline (documents / embeddings)
        "text_token_count": _text.token_count,
        "text_quality_score": _text.quality_score,
        "text_lang_id": _text.lang_id,
        "text_fingerprint": _text.fingerprint,
        # Gopher-style repetition predicates (seeded variants — see
        # pipeline/text.repetition)
        "text_repetition": _text.repetition,
        # BPE-ish regex tokenizer next to the whitespace one (seeded
        # digit/punct suffixes make the ratio non-vacuous)
        "text_token_bpe": _text.token_count_bpe,
        "dedup_exact": _dedup.dedup_exact,
        "dedup_ngram_jaccard": _dedup.dedup_ngram_jaccard,
        "dedup_minhash_lsh": _dedup.dedup_minhash_lsh,
        "dedup_cluster": _dedup.dedup_cluster,
        "corpus_build": _corpus.corpus_build,
        # second config point (CorpusConfig is a job parameter, not a
        # constant): the 'und' slice at a looser quality bar (the
        # synthetic corpus only ever predicts en/und — corpus.py)
        "corpus_build_alt": lambda spark, sf: _corpus.corpus_build(
            spark, sf, _corpus.ALT_CONFIG
        ),
        # per-doc drop lineage (the corpus rejections table), both
        # config points
        "corpus_reasons": _corpus.corpus_reasons,
        "corpus_reasons_alt": lambda spark, sf: _corpus.corpus_reasons(
            spark, sf, _corpus.ALT_CONFIG
        ),
        # third config point: the repetition gate on (REP_CONFIG sets
        # max_top2gram_frac_e4 — drops high-repetition docs, reason
        # 'dropped_repetition' last in precedence)
        "corpus_build_rep": lambda spark, sf: _corpus.corpus_build(
            spark, sf, _corpus.REP_CONFIG
        ),
        "corpus_reasons_rep": lambda spark, sf: _corpus.corpus_reasons(
            spark, sf, _corpus.REP_CONFIG
        ),
        "corpus_sample_stratified": _corpus.sample_stratified,
        # benchmark decontamination: corpus docs sharing any 13-gram
        # with the seeded eval set (pipeline/decontaminate.py —
        # broadcast gram-hash probe, corpus side never shuffles)
        "corpus_decontaminate": _decon.corpus_decontaminate,
        # integer-exact PageRank over the seeded link multigraph —
        # frontier prioritization's link-analysis signal as join+groupBy
        # power-iteration rounds (operators/graph.py)
        "graph_pagerank": _graph.graph_pagerank,
        "corpus_shard_pack": _corpus.shard_pack,
        "corpus_interleave": _corpus.interleave,
        "corpus_pipeline_pack": _corpus.pipeline_pack,
        "dedup_simhash": _dedup.dedup_simhash,
        "dedup_image_phash": _imgdedup.dedup_image_phash,
        "dedup_embedding_cosine": _ann.dedup_embedding_cosine,
        "dedup_embedding_cluster": _ann.dedup_embedding_cluster,
        "ann_brute_force": _ann.ann_brute_force,
        "ann_lsh": _ann.ann_lsh,
        "ann_lsh_multi": _ann.ann_lsh_multi,
        # full oracle since round 3: bounded fixed-point Lloyd training
        # unrolls to SQL (_ann_ivf_oracle); pytest recall properties
        # remain as semantic checks (tests/test_ann_ivf.py)
        "ann_ivf": _ann.ann_ivf,
        "embedding_norm_stats": _ann.norm_stats,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the pricing-summary aggregate at sf0.001 (scan → filter
    pushdown → partial-agg groupBy; the engine's bread-and-butter plan)."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


_STOP = "'" + "','".join(_text.STOPWORDS) + "'"
_LANG_CASES = " ".join(
    f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'"
    for lang in _text.LANG_MARKERS
)
_LANG_SCORES = ", ".join(
    "len(list_filter(string_split(lower(text), ' '), x -> x IN ('"
    + "','".join(m)
    + f"'))) AS s_{lang}"
    for lang, m in _text.LANG_MARKERS.items()
)
_H60 = "cast(('0x' || substr(md5({x}), 1, 15)) as bigint)"


def _ann_ivf_oracle() -> str:
    """Generated unrolled-Lloyd oracle for ann_ivf.

    The Spark side trains k-means on the driver (pipeline/ann.py
    ``_lloyd_fixed_point``: bounded sample, fixed-point centroid
    updates); the same fixed iteration count unrolls here as a CTE
    chain, and the integer centroid arithmetic (exact int64 sums,
    floor-divide) makes the two engines' centroids bit-identical — so
    the assignment + probe + cosine top-k downstream hash-match."""
    stride = _ann.KMEANS_SAMPLE_STRIDE
    cap = _ann.KMEANS_SAMPLE_CAP
    k = _ann.N_CELLS
    iters = _ann.KMEANS_ITERS
    q = _ann.KMEANS_Q
    n_probe = _ann.N_PROBE
    qs = _ann.QUERY_STRIDE
    topk = _ann.TOP_K
    ctes = [
        "e AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS v"
        " FROM embeddings)",
        f"samp AS (SELECT vec_id, v FROM e WHERE vec_id % {stride} = 0"
        f" ORDER BY vec_id LIMIT {cap})",
        "sq AS (SELECT vec_id, v, list_transform(v, x -> cast(floor(x *"
        f" {q}) as bigint)) AS vq FROM samp)",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,"
        f" list_transform(vq, qq -> cast(qq as double) / {q}.0) AS cv"
        f" FROM (SELECT vec_id, vq FROM sq ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(iters):
        ctes += [
            # assignment: nearest centroid (ties → lowest cell)
            f"a{t} AS (SELECT vec_id, vq, cell FROM ("
            " SELECT s.vec_id, s.vq, c.cell,"
            " row_number() OVER (PARTITION BY s.vec_id"
            " ORDER BY list_distance(s.v, c.cv), c.cell) AS rk"
            f" FROM sq s CROSS JOIN c{t} c) WHERE rk = 1)",
            # per-(cell, dim) exact integer sums → floor-divided mean
            f"s{t} AS (SELECT cell, dim,"
            " cast(floor(cast(sum(vq[dim]) as double) / count(*))"
            " as bigint) AS qd"
            f" FROM a{t}, unnest(range(1, len(vq) + 1)) AS u(dim)"
            " GROUP BY cell, dim)",
            f"n{t} AS (SELECT cell, list(qd ORDER BY dim) AS cq"
            f" FROM s{t} GROUP BY cell)",
            # empty cells keep their previous centroid
            f"c{t + 1} AS (SELECT p.cell, coalesce("
            f" list_transform(n.cq, qq -> cast(qq as double) / {q}.0),"
            f" p.cv) AS cv FROM c{t} p LEFT JOIN n{t} n"
            " ON p.cell = n.cell)",
        ]
    ctes += [
        "wc AS (SELECT e.vec_id, e.v, c.cell,"
        " row_number() OVER (PARTITION BY e.vec_id"
        " ORDER BY list_distance(e.v, c.cv), c.cell) AS rk"
        f" FROM e CROSS JOIN c{iters} c)",
        "assigned AS (SELECT vec_id, v, cell FROM wc WHERE rk = 1)",
        "probes AS (SELECT vec_id AS query_id, v AS qv, cell FROM wc"
        f" WHERE vec_id % {qs} = 0 AND rk <= {n_probe})",
        "cand AS (SELECT query_id, a.vec_id AS nn_id, qv, a.v AS v"
        " FROM probes JOIN assigned a ON probes.cell = a.cell"
        " AND a.vec_id <> probes.query_id)",
        "scored AS (SELECT DISTINCT query_id, nn_id,"
        " cast(floor((list_dot_product(qv, v) /"
        " (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))))"
        " * 1000000) as bigint) AS cosine_e6 FROM cand)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, nn_id, cosine_e6, rank FROM ("
        " SELECT *, row_number() OVER (PARTITION BY query_id"
        " ORDER BY cosine_e6 DESC, nn_id) AS rank FROM scored) t"
        f" WHERE rank <= {topk} ORDER BY query_id, rank"
    )


def oracle_sql() -> dict[str, str]:
    nm = _dedup.N_MINHASH
    rpb = _dedup.N_MINHASH // _dedup.LSH_BANDS
    sqls = {
        "scan_filter": """
            SELECT l_orderkey, l_linenumber,
                   cast(round(l_quantity * 100) as bigint) AS qty_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 45
        """,
        "filter_chain": """
            SELECT p_partkey, p_brand, p_size,
                   cast(round(p_retailprice * 100) as bigint) AS price_cents
            FROM part
            WHERE p_size BETWEEN 5 AND 40
              AND lower(p_type) LIKE '%stand%'
              AND p_retailprice / p_size > 30
        """,
        "seen_anti_join": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
        """,
        "seen_semi_join": """
            SELECT s_suppkey, s_name FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        """,
        "broadcast_join_agg": """
            SELECT n_name, count(*) AS n_orders,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "first_wins_md5": """
            SELECT doc_id, source, content_md5 FROM (
              SELECT doc_id, source, md5(text) AS content_md5,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "politeness_topk": """
            SELECT user_id, event_id, event_type, rn FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn <= 3
        """,
        "latest_wins_fold": """
            SELECT user_id, event_type, event_id,
                   cast(round(value * 100) as bigint) AS value_cents FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "counter_tally": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS value_cents
            FROM events GROUP BY event_type
        """,
        "per_depth_counts": """
            SELECT lang, source, count(*) AS n_docs,
                   cast(sum(n_chars) as bigint) AS total_chars,
                   min(doc_id) AS first_doc
            FROM documents GROUP BY lang, source
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(cast(round(l_quantity * 100) as bigint)) as bigint) AS sum_qty_cents,
                   cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) AS sum_base_cents,
                   cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)) as bigint) AS revenue_cents
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
        """,
        "running_sum": """
            SELECT o_custkey, o_orderkey,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS running_cents
            FROM orders WHERE o_custkey % 100 = 0
        """,
        "ordered_prefix_cap": """
            SELECT o_orderkey, o_orderdate, o_orderstatus FROM orders
            ORDER BY o_orderdate, o_orderkey LIMIT 100
        """,
        "union_channels": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT user_id FROM events WHERE value > 90)
        """,
        "json_extract": """
            SELECT event_id, cast(json_extract_string(props, '$.k') as bigint) AS k
            FROM events
            WHERE cast(json_extract_string(props, '$.k') as bigint) > 80
        """,
        "string_kernels": """
            SELECT doc_id, string_split(text, ' ')[1] AS first_word,
                   cast(length(text) as bigint) AS len,
                   substr(md5(text), 1, 8) AS md5_prefix
            FROM documents
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, event_id,
                     cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS sess_id,
                     ts
              FROM g
            )
            SELECT user_id, sess_id, count(*) AS n_events,
                   min(event_id) AS first_event
            FROM s GROUP BY user_id, sess_id
        """,
        "tumbling_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "sliding_window": """
            WITH x AS (
              SELECT time_bucket(INTERVAL '30 minutes', ts)
                       - (s.i * INTERVAL '30 minutes') AS win_start,
                     event_type, value
              FROM events, (SELECT unnest([0, 1]) AS i) s
            )
            SELECT cast(epoch_us(win_start) as bigint) AS win_start_us,
                   event_type, count(*) AS n,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint)
                     AS value_cents
            FROM x GROUP BY 1, 2
        """,
        "rollup_counts": """
            SELECT lang, source, count(*) AS n,
                   cast(sum(n_chars) as bigint) AS chars
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "pivot_status": """
            SELECT o_orderpriority,
                   sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
                   sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
                   sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "except_set": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'click'
              EXCEPT ALL
              SELECT user_id FROM events WHERE event_type = 'purchase')
        """,
        "intersect_set": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        # ---- training-data pipeline -------------------------------------
        "text_token_count": """
            SELECT doc_id,
                   cast(len(string_split(text, ' ')) as int) AS n_tokens,
                   cast(length(text) as int) AS n_chars_actual,
                   cast(floor((length(text) * 1.0 / len(string_split(text, ' ')))
                              * 10000) as bigint) AS avg_token_len_e4
            FROM documents ORDER BY doc_id
        """,
        "text_quality_score": f"""
            WITH b AS (
              SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
            ), m AS (
              SELECT doc_id,
                     least(length(text) / 500.0, 1.0) AS len_score,
                     len(list_filter(toks, x -> x IN ({_STOP}))) * 1.0 / len(toks)
                       AS stop_ratio,
                     cast(length(text) - length(replace(text, '.', '')) as int)
                       AS n_sentences
              FROM b)
            SELECT doc_id, cast(floor(len_score * 10000) as bigint) AS len_score_e4,
                   cast(floor(stop_ratio * 10000) as bigint) AS stop_ratio_e4,
                   n_sentences,
                   cast(floor((0.5 * len_score + 0.5 * stop_ratio) * 10000) as bigint)
                     AS quality_e4
            FROM m ORDER BY doc_id
        """,
        "text_lang_id": f"""
            WITH s AS (
              SELECT doc_id, lang, {_LANG_SCORES} FROM documents
            ), b AS (
              SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best FROM s
            )
            SELECT doc_id, lang AS lang_true,
                   CASE {_LANG_CASES} ELSE 'und' END AS lang_pred
            FROM b ORDER BY doc_id
        """,
        "text_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS fp,
                   substr(md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')), 1, 4)
                     AS fp_bucket
            FROM documents ORDER BY doc_id
        """,
        # Gopher-style repetition predicates over the seeded text
        # variants (pipeline/text.repetition: doc_id%5 -> duplicated
        # line, doc_id%7 -> ' # # ...' symbol suffix). Single double
        # division per metric, floor-truncated — bit-identical engines.
        "text_repetition": r"""
            WITH seeded AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN t1 || ' # # ...' ELSE t1 END AS t2
              FROM (
                SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || text
                       ELSE text END AS t1
                FROM documents) x
            ), base AS (
              SELECT doc_id, t2,
                     string_split(t2, chr(10)) AS lines,
                     regexp_split_to_array(t2, '\s+') AS words
              FROM seeded
            ), grams AS (
              SELECT doc_id, t2, lines, words,
                list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i+1]) AS g2
              FROM base
            )
            SELECT doc_id,
              cast(len(lines) as int) AS n_lines,
              cast(floor((len(lines) - len(list_distinct(lines)))
                         * 10000.0 / len(lines)) as bigint)
                AS dup_line_frac_e4,
              cast(floor(CASE WHEN len(g2) = 0 THEN 0.0 ELSE
                list_max(list_transform(list_distinct(g2),
                  u -> len(list_filter(g2, x -> x = u))))
                * 10000.0 / len(g2) END) as bigint) AS top2gram_frac_e4,
              cast(floor(((length(t2) - length(replace(t2, '#', '')))
                          + (length(t2) - length(replace(t2, '...', ''))) / 3)
                         * 10000.0 / len(words)) as bigint)
                AS symbol_word_ratio_e4
            FROM grams ORDER BY doc_id
        """,
        # BPE-ish regex tokenization next to the whitespace tokenizer
        # (pipeline/text.token_count_bpe; identical char-class regex
        # semantics in Java regex and RE2)
        "text_token_bpe": r"""
            WITH seeded AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN text || ' v' || CAST(doc_id AS VARCHAR)
                          || '.2-rc(' || CAST(doc_id % 97 AS VARCHAR) || ')'
                     ELSE text END AS t
              FROM documents
            )
            SELECT doc_id,
              cast(len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                   as int) AS n_bpe_tokens,
              cast(len(string_split(t, ' ')) as int) AS n_ws_tokens,
              cast(floor(
                len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                * 10000.0 / len(string_split(t, ' '))) as bigint)
                AS bpe_per_word_e4
            FROM seeded ORDER BY doc_id
        """,
        # benchmark decontamination: 13-gram intersect join between the
        # corpus and the seeded eval excerpts (doc_id%17==3, tokens
        # 5..29), on the same portable md5-derived 60-bit gram hashes
        # the engine probes with (pipeline/decontaminate.py)
        "corpus_decontaminate": """
            WITH ev AS (
              SELECT array_to_string(
                       list_slice(string_split(text, ' '), 5, 29), ' ')
                     AS text
              FROM documents WHERE doc_id % 17 = 3
            ), evg AS (
              SELECT DISTINCT
                cast(('0x' || substr(md5(g), 1, 15)) as bigint) AS g
              FROM (
                SELECT unnest(list_distinct(
                  CASE WHEN len(toks) < 13 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, len(toks) - 11),
                    i -> array_to_string(list_slice(toks, i, i + 12), ' '))
                  END)) AS g
                FROM (SELECT string_split(text, ' ') AS toks FROM ev) x) y
            ), dg AS (
              SELECT doc_id,
                cast(('0x' || substr(md5(g), 1, 15)) as bigint) AS g
              FROM (
                SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(toks) < 13 THEN []::VARCHAR[]
                  ELSE list_transform(range(1, len(toks) - 11),
                    i -> array_to_string(list_slice(toks, i, i + 12), ' '))
                  END)) AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents) x) y
            )
            SELECT dg.doc_id,
                   cast(count(*) as bigint) AS n_overlap_grams
            FROM dg JOIN evg ON dg.g = evg.g
            GROUP BY dg.doc_id ORDER BY dg.doc_id
        """,
        "dedup_exact": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents
              WHERE doc_id % 7 = 0
            )
            SELECT md5(text) AS content_md5, count(*) AS n_copies,
                   min(doc_id) AS keeper_doc_id
            FROM corpus GROUP BY md5(text) HAVING count(*) > 1
            ORDER BY keeper_doc_id
        """,
        "dedup_ngram_jaccard": f"""
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh_all AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[i:i+2], ' ') AS shingle
              FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
            ), keep AS (
              SELECT shingle FROM sh_all GROUP BY shingle
              HAVING count(*) <= {_dedup.MAX_SHINGLE_DOC_FREQ}
            ), sh AS (
              SELECT doc_id, sh_all.shingle FROM sh_all
              JOIN keep ON sh_all.shingle = keep.shingle
            ), sizes AS (
              SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_common,
                   cast(floor((n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common))
                              * 10000) as bigint) AS jaccard_e4
            FROM pairs
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.6
            ORDER BY doc_a, doc_b
        """,
        "dedup_minhash_lsh": f"""
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
              FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
            ), keyed AS (
              SELECT doc_id,
                     {_H60.format(x="shingle")} AS h1,
                     {_H60.format(x="shingle || '#2'")} % 1099511627776 AS h2
              FROM sh
            ), hs AS (
              SELECT doc_id, h, h1 + h * h2 AS hv
              FROM keyed, unnest(range(0, {nm})) AS uh(h)
            ), sig AS (
              SELECT doc_id, h, min(hv) AS minhash FROM hs GROUP BY doc_id, h
            ), bands AS (
              SELECT doc_id, cast(h / {rpb} as int) AS band,
                     md5(string_agg(minhash::VARCHAR, ',' ORDER BY h)) AS bucket
              FROM sig GROUP BY doc_id, cast(h / {rpb} as int)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            ), est AS (
              SELECT doc_a, doc_b,
                     cast(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                          as bigint) AS n_agree
              FROM cand
              JOIN sig sa ON sa.doc_id = doc_a
              JOIN sig sb ON sb.doc_id = doc_b AND sb.h = sa.h
              GROUP BY doc_a, doc_b
            )
            SELECT doc_a, doc_b, n_agree FROM est
            WHERE n_agree >= {int(0.5 * nm)} ORDER BY doc_a, doc_b
        """,
        "dedup_simhash": f"""
            WITH words AS (
              SELECT doc_id, {_H60.format(x="w")} AS hv
              FROM documents, unnest(string_split(text, ' ')) AS uw(w)
            ), bits AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM words, unnest(range(0, {_dedup.SIMHASH_BITS})) AS ub(bit)
              GROUP BY doc_id, bit
            ), packed AS (
              SELECT doc_id,
                     cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)
                          as bigint) AS simhash
              FROM bits GROUP BY doc_id
            ), segs AS (
              SELECT doc_id, simhash, seg, (simhash >> (seg * 10)) & 1023 AS seg_val
              FROM packed, unnest(range(0, {_dedup.SIMHASH_SEGS})) AS us(seg)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.simhash AS sh_a, b.simhash AS sh_b
              FROM segs a JOIN segs b
                ON a.seg = b.seg AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, cast(bit_count(xor(sh_a, sh_b)) as int) AS hamming
            FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
            ORDER BY doc_a, doc_b
        """,
        "ann_brute_force": """
            WITH e AS (
              SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings
            ), q AS (
              SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0
            ), pairs AS (
              SELECT query_id, e.vec_id AS nn_id,
                     cast(floor((list_dot_product(qv, v) /
                           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))))
                           * 1000000) as bigint) AS cosine_e6
              FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, nn_id, cosine_e6, rank FROM (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine_e6 DESC, nn_id) AS rank
              FROM pairs) WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "ann_lsh": """
            WITH e AS (
              SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings
            ), planes AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS plane_id, v AS pv
              FROM e ORDER BY vec_id LIMIT 8
            ), sig AS (
              SELECT vec_id,
                     cast(sum(CASE WHEN list_dot_product(v, pv) >= 0
                         THEN (1::BIGINT << plane_id) ELSE 0 END) as bigint) AS bucket
              FROM e CROSS JOIN planes GROUP BY vec_id
            ), es AS (
              SELECT e.vec_id, v, bucket FROM e JOIN sig ON e.vec_id = sig.vec_id
            ), q AS (
              SELECT vec_id AS query_id, v AS qv, bucket FROM es WHERE vec_id % 50 = 0
            ), cand AS (
              SELECT query_id, es.vec_id AS nn_id,
                     cast(floor((list_dot_product(qv, v) /
                           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))))
                           * 1000000) as bigint) AS cosine_e6
              FROM q JOIN es ON q.bucket = es.bucket AND es.vec_id <> q.query_id
            )
            SELECT query_id, nn_id, cosine_e6, rank FROM (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine_e6 DESC, nn_id) AS rank
              FROM cand) WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "ann_lsh_multi": f"""
            WITH e AS (
              SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings
            ), p AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS pid_all, v AS pv
              FROM e ORDER BY vec_id LIMIT {_ann.N_TABLES * _ann.N_PLANES}
            ), planes AS (
              SELECT pid_all // {_ann.N_PLANES} AS tbl,
                     pid_all % {_ann.N_PLANES} AS plane_id, pv
              FROM p
            ), sig AS (
              SELECT vec_id, tbl,
                     cast(sum(CASE WHEN list_dot_product(v, pv) >= 0
                         THEN (1::BIGINT << plane_id) ELSE 0 END) as bigint) AS bucket
              FROM e CROSS JOIN planes GROUP BY vec_id, tbl
            ), q AS (
              SELECT vec_id AS query_id, tbl, bucket FROM sig WHERE vec_id % 50 = 0
            ), cand AS (
              SELECT DISTINCT query_id, s.vec_id AS nn_id
              FROM q JOIN sig s ON q.tbl = s.tbl AND q.bucket = s.bucket
                 AND s.vec_id <> q.query_id
            ), scored AS (
              SELECT query_id, nn_id,
                     cast(floor((list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))
                           * 1000000) as bigint) AS cosine_e6
              FROM cand
              JOIN e a ON a.vec_id = query_id
              JOIN e b ON b.vec_id = nn_id
            )
            SELECT query_id, nn_id, cosine_e6, rank FROM (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine_e6 DESC, nn_id) AS rank
              FROM scored) WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "ann_ivf": _ann_ivf_oracle(),
        "dedup_embedding_cosine": f"""
            WITH base AS (
              SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings
            ), e AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 10000000 AS vec_id,
                     list_transform(v, x -> x * 1.25) AS v
              FROM base WHERE vec_id % 10 = 0
            ), p AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS pid_all, v AS pv
              FROM e ORDER BY vec_id LIMIT {_ann.N_TABLES * _ann.N_PLANES}
            ), planes AS (
              SELECT pid_all // {_ann.N_PLANES} AS tbl,
                     pid_all % {_ann.N_PLANES} AS plane_id, pv
              FROM p
            ), sig AS (
              SELECT vec_id, tbl,
                     cast(sum(CASE WHEN list_dot_product(v, pv) >= 0
                         THEN (1::BIGINT << plane_id) ELSE 0 END) as bigint) AS bucket
              FROM e CROSS JOIN planes GROUP BY vec_id, tbl
            ), cand AS (
              SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM sig a JOIN sig b
                ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            ), scored AS (
              SELECT vec_a, vec_b,
                     cast(floor((list_dot_product(ea.v, eb.v) /
                           (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))))
                           * 1000000) as bigint) AS cosine_e6
              FROM cand
              JOIN e ea ON ea.vec_id = vec_a
              JOIN e eb ON eb.vec_id = vec_b
            )
            SELECT vec_a, vec_b, cosine_e6 FROM scored
            WHERE cosine_e6 >= {_ann.DUP_THRESHOLD_E6} ORDER BY vec_a, vec_b
        """,
        "embedding_norm_stats": """
            WITH e AS (
              SELECT label, sqrt(list_dot_product(cast(embedding as DOUBLE[]),
                                                  cast(embedding as DOUBLE[]))) AS nrm
              FROM embeddings
            )
            SELECT label, count(*) AS n,
                   cast(floor(avg(nrm) * 10000) as bigint) AS avg_norm_e4,
                   cast(floor(max(nrm) * 10000) as bigint) AS max_norm_e4
            FROM e GROUP BY label ORDER BY label
        """,
    }
    # connected-components resolution over the minhash near-dup pairs:
    # reachability closure via a recursive CTE — min reachable doc_id is
    # the cluster id (exactly the fixpoint of the engine's hash-min
    # label propagation, pipeline/dedup.dedup_cluster)
    sqls["dedup_cluster"] = f"""
        WITH RECURSIVE pairs AS (
          SELECT doc_a, doc_b FROM ({sqls['dedup_minhash_lsh']}) q
        ), edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ), verts AS (
          SELECT DISTINCT src AS doc_id FROM edges
        ), reach AS (
          SELECT doc_id, doc_id AS r FROM verts
          UNION
          SELECT re.doc_id, e.dst AS r
          FROM reach re JOIN edges e ON re.r = e.src
        )
        SELECT doc_id, min(r) AS cluster_id,
               (min(r) = doc_id) AS is_canonical
        FROM reach GROUP BY doc_id ORDER BY doc_id
    """
    # composite training-corpus pipeline: lang filter + quality
    # threshold + exact keep-first + near-dup keep-canonical, composed
    # from the already-oracled stages. Parameterized by CorpusConfig —
    # the gates run at TWO config points (default + ALT_CONFIG).
    # raw-text top-2-gram fraction (the corpus repetition signal —
    # pipeline/text.raw_top2gram); used only by config points that set
    # max_top2gram_frac_e4
    _rep_sql = r"""
        SELECT doc_id,
          cast(floor(CASE WHEN len(g2) = 0 THEN 0.0 ELSE
            list_max(list_transform(list_distinct(g2),
              u -> len(list_filter(g2, x -> x = u))))
            * 10000.0 / len(g2) END) as bigint) AS top2gram_frac_e4
        FROM (
          SELECT doc_id,
            list_transform(range(1, len(words)),
                           i -> words[i] || ' ' || words[i+1]) AS g2
          FROM (
            SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
            FROM documents) w) g
    """

    def _corpus_build_sql(cfg) -> str:
        rep_join = rep_cond = ""
        if cfg.max_top2gram_frac_e4 is not None:
            rep_join = f"JOIN ({_rep_sql}) rp ON rp.doc_id = h.doc_id"
            rep_cond = (
                f"AND rp.top2gram_frac_e4 <= {cfg.max_top2gram_frac_e4}"
            )
        return f"""
        WITH q AS (
          SELECT doc_id, quality_e4 FROM ({sqls['text_quality_score']}) x
        ), l AS (
          SELECT doc_id, lang_pred FROM ({sqls['text_lang_id']}) x
        ), clusters AS (
          SELECT doc_id, is_canonical FROM ({sqls['dedup_cluster']}) x
        ), hashed AS (
          SELECT doc_id, md5(text) AS k FROM documents
        ), keeper AS (
          SELECT k, min(doc_id) AS keep_id FROM hashed GROUP BY k
        )
        SELECT h.doc_id, l.lang_pred, q.quality_e4
        FROM hashed h
        JOIN keeper ke ON h.k = ke.k AND h.doc_id = ke.keep_id
        JOIN q ON q.doc_id = h.doc_id
        JOIN l ON l.doc_id = h.doc_id
        LEFT JOIN clusters c ON c.doc_id = h.doc_id
        {rep_join}
        WHERE l.lang_pred = '{cfg.keep_lang}'
          AND q.quality_e4 >= {cfg.min_quality_e4}
          AND (c.doc_id IS NULL OR c.is_canonical)
          {rep_cond}
        ORDER BY h.doc_id
    """

    # drop lineage (the corpus rejections table): first failing reason
    # per dropped doc — precedence dropped_exact > dropped_near_dup >
    # dropped_lang > dropped_quality, matching corpus_build's stage
    # order — plus the responsible keeper (exact keeper / cluster
    # canonical; -1 sentinel for lang/quality drops: a NULL-bearing int
    # column degrades to float64/object in the pandas bridges and
    # breaks the dtype-strict value hash). Complement invariant:
    # |corpus_build| + |corpus_reasons| == |documents| (pytest-pinned).
    def _corpus_reasons_sql(cfg) -> str:
        rep_join = rep_case = ""
        if cfg.max_top2gram_frac_e4 is not None:
            rep_join = f"JOIN ({_rep_sql}) rp ON rp.doc_id = h.doc_id"
            rep_case = (
                f"WHEN top2gram_frac_e4 > {cfg.max_top2gram_frac_e4} "
                "THEN 'dropped_repetition'"
            )
        rep_col = (
            ", rp.top2gram_frac_e4" if cfg.max_top2gram_frac_e4 is not None else ""
        )
        return f"""
        WITH q AS (
          SELECT doc_id, quality_e4 FROM ({sqls['text_quality_score']}) x
        ), l AS (
          SELECT doc_id, lang_pred FROM ({sqls['text_lang_id']}) x
        ), clusters AS (
          SELECT doc_id, cluster_id, is_canonical
          FROM ({sqls['dedup_cluster']}) x
        ), hashed AS (
          SELECT doc_id, md5(text) AS k FROM documents
        ), keeper AS (
          SELECT k, min(doc_id) AS keep_id FROM hashed GROUP BY k
        ), joined AS (
          SELECT h.doc_id, ke.keep_id, c.cluster_id, c.is_canonical,
                 l.lang_pred, q.quality_e4{rep_col}
          FROM hashed h
          JOIN keeper ke ON h.k = ke.k
          JOIN q ON q.doc_id = h.doc_id
          JOIN l ON l.doc_id = h.doc_id
          LEFT JOIN clusters c ON c.doc_id = h.doc_id
          {rep_join}
        ), tagged AS (
          SELECT doc_id,
                 CASE
                   WHEN doc_id <> keep_id THEN 'dropped_exact'
                   WHEN cluster_id IS NOT NULL AND NOT is_canonical
                     THEN 'dropped_near_dup'
                   WHEN lang_pred <> '{cfg.keep_lang}' THEN 'dropped_lang'
                   WHEN quality_e4 < {cfg.min_quality_e4}
                     THEN 'dropped_quality'
                   {rep_case}
                 END AS reason,
                 CASE
                   WHEN doc_id <> keep_id THEN keep_id
                   WHEN cluster_id IS NOT NULL AND NOT is_canonical
                     THEN cluster_id
                   ELSE -1
                 END AS keeper_doc_id
          FROM joined
        )
        SELECT doc_id, reason,
               cast(keeper_doc_id as bigint) AS keeper_doc_id
        FROM tagged WHERE reason IS NOT NULL ORDER BY doc_id
    """

    # integer-exact PageRank (operators/graph.py): the power iteration
    # UNROLLS to a CTE chain (the ann_ivf-Lloyd pattern) — floor-div
    # per-edge contributions keep every SUM order-independent 64-bit
    # arithmetic, so the unrolled SQL matches Spark bit-for-bit
    from snapcrawler_spark.operators import graph as _graph_mod

    _pr_edges = " UNION ALL ".join(
        "SELECT doc_id AS src, "
        f"cast(('0x' || substr(md5('g{k}#' || CAST(doc_id AS VARCHAR)), 1, 15))"
        " as bigint) % (SELECT n FROM nn) AS dst FROM documents"
        for k in range(_graph_mod.GRAPH_OUT_DEGREE)
    )
    _pr_sql = f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        docs AS (SELECT doc_id FROM documents),
        edges AS ({_pr_edges}),
        outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        s0 AS (SELECT doc_id, CAST({_graph_mod.PR_SCALE} AS BIGINT) AS pr
               FROM docs)"""
    _prev = "s0"
    for _t in range(1, _graph_mod.PR_ITERS + 1):
        _pr_sql += f""",
        c{_t} AS (SELECT e.dst, SUM({_prev}.pr // o.outdeg) AS inflow
                 FROM {_prev} JOIN outdeg o ON {_prev}.doc_id = o.src
                 JOIN edges e ON e.src = {_prev}.doc_id GROUP BY e.dst),
        s{_t} AS (SELECT d.doc_id,
                 CAST({_graph_mod.PR_BASE} + ({_graph_mod.PR_DAMP}
                      * COALESCE(c.inflow, 0)) // {_graph_mod.PR_SCALE}
                      AS BIGINT) AS pr
                 FROM docs d LEFT JOIN c{_t} c ON c.dst = d.doc_id)"""
        _prev = f"s{_t}"
    _pr_sql += f"\nSELECT doc_id, pr AS pr_e6 FROM {_prev} ORDER BY doc_id"
    sqls["graph_pagerank"] = _pr_sql

    sqls["corpus_build"] = _corpus_build_sql(_corpus.CorpusConfig())
    sqls["corpus_build_alt"] = _corpus_build_sql(_corpus.ALT_CONFIG)
    sqls["corpus_build_rep"] = _corpus_build_sql(_corpus.REP_CONFIG)
    sqls["corpus_reasons"] = _corpus_reasons_sql(_corpus.CorpusConfig())
    sqls["corpus_reasons_alt"] = _corpus_reasons_sql(_corpus.ALT_CONFIG)
    sqls["corpus_reasons_rep"] = _corpus_reasons_sql(_corpus.REP_CONFIG)
    rate_cases = " ".join(
        f"WHEN lang = '{lg}' THEN {r}"
        for lg, r in _corpus.SAMPLE_RATE_E4.items()
    )
    sqls["corpus_sample_stratified"] = f"""
        WITH b AS (
          SELECT doc_id, lang,
                 {_H60.format(x="'smp#' || cast(doc_id as varchar)")} % 10000
                   AS bucket
          FROM documents
        )
        SELECT doc_id, lang, bucket FROM b
        WHERE bucket < (CASE {rate_cases}
                        ELSE {_corpus.SAMPLE_DEFAULT_E4} END)
        ORDER BY doc_id
    """
    # token-budget shard packing: exclusive global prefix sum of
    # whitespace token counts in doc_id order, shard = prefix // budget.
    # Engine side is operators/order.prefix_sum (range-partitioned, no
    # single-partition window); the oracle is the plain window form —
    # identical integers, so the floor-div matches bitwise
    sqls["corpus_shard_pack"] = f"""
        WITH t AS (
          SELECT doc_id,
                 cast(len(string_split(text, ' ')) as int) AS n_tokens
          FROM documents
        )
        SELECT doc_id, n_tokens,
               cast(coalesce(cast(sum(n_tokens) OVER (
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) as bigint), 0)
                    // {_corpus.SHARD_BUDGET_TOKENS} as bigint) AS shard_id
        FROM t ORDER BY doc_id
    """
    # deterministic mixture interleaving: per-lang rank r, virtual time
    # pos_e6 = (r*10^8) // weight_e2, global dense rank over
    # (pos, lang, doc_id). Engine global rank = dense_order_key; oracle
    # = the plain global window — identical integers
    mix_cases = " ".join(
        f"WHEN lang = '{lg}' THEN {wt}"
        for lg, wt in _corpus.MIX_WEIGHT_E2.items()
    )
    sqls["corpus_interleave"] = f"""
        WITH r AS (
          SELECT doc_id, lang,
                 cast(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                      as bigint) AS r
          FROM documents
        ), p AS (
          SELECT doc_id, lang, r,
                 cast((r * 100000000) //
                      (CASE {mix_cases} ELSE {_corpus.MIX_DEFAULT_E2} END)
                      as bigint) AS pos_e6
          FROM r
        )
        SELECT doc_id, lang, r, pos_e6,
               cast(row_number() OVER (ORDER BY pos_e6, lang, doc_id)
                    as bigint) AS interleave_seq
        FROM p ORDER BY doc_id
    """
    # capstone: the full chain (build -> source-mixture interleave of
    # survivors -> shard pack in interleave order) as one query; the
    # oracle composes corpus_build's SQL with the two window stages
    pipe_cases = " ".join(
        f"WHEN source = '{s}' THEN {wt}"
        for s, wt in _corpus.PIPE_MIX_WEIGHT_E2.items()
    )
    sqls["corpus_pipeline_pack"] = f"""
        WITH surv AS (
          SELECT doc_id FROM ({sqls['corpus_build']}) x
        ), d AS (
          SELECT doc.doc_id, doc.source,
                 cast(len(string_split(doc.text, ' ')) as int) AS n_tokens
          FROM documents doc JOIN surv ON surv.doc_id = doc.doc_id
        ), rk AS (
          SELECT doc_id, source, n_tokens,
                 cast(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                      as bigint) AS r
          FROM d
        ), ps AS (
          SELECT doc_id, source, n_tokens,
                 cast((r * 100000000) //
                      (CASE {pipe_cases}
                       ELSE {_corpus.PIPE_MIX_DEFAULT_E2} END)
                      as bigint) AS pos_e6
          FROM rk
        ), il AS (
          SELECT doc_id, source, n_tokens,
                 cast(row_number() OVER (ORDER BY pos_e6, source, doc_id)
                      as bigint) AS interleave_seq
          FROM ps
        )
        SELECT doc_id, source, interleave_seq, n_tokens,
               cast(coalesce(cast(sum(n_tokens) OVER (
                      ORDER BY interleave_seq
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) as bigint), 0)
                    // {_corpus.PIPE_SHARD_BUDGET_TOKENS} as bigint) AS shard_id
        FROM il ORDER BY doc_id
    """
    # image pHash near-dup clusters over the seeded deterministic image
    # table (operators/image_dedup.seeded_phash_images): the oracle is
    # brute-force all-pairs hamming (bit_count(xor)) — the pigeonhole
    # candidate generation is exact for hamming <= 3, so both engines
    # compute the same pair relation — then recursive-CTE reachability
    # with min-reachable-id labels, mirroring dedup_cluster's oracle
    _ph = _H60.format(x="'ph#' || cast(doc_id as varchar)")
    sqls["dedup_image_phash"] = f"""
        WITH RECURSIVE imgs AS (
          SELECT doc_id AS image_id, {_ph} AS ph FROM documents
          UNION ALL
          SELECT doc_id + 10000000,
                 xor({_ph}, (1::BIGINT << (doc_id % 60)))
          FROM documents WHERE doc_id % 4 = 0
          UNION ALL
          SELECT doc_id + 20000000,
                 xor(xor({_ph}, (1::BIGINT << ((doc_id * 7) % 60))),
                     (1::BIGINT << ((doc_id * 13 + 1) % 60)))
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 30000000, {_ph}
          FROM documents WHERE doc_id % 9 = 0
        ), pairs AS (
          SELECT a.image_id AS ia, b.image_id AS ib
          FROM imgs a JOIN imgs b ON a.image_id < b.image_id
          WHERE bit_count(xor(a.ph, b.ph)) <= 3
        ), edges AS (
          SELECT ia AS src, ib AS dst FROM pairs
          UNION ALL
          SELECT ib AS src, ia AS dst FROM pairs
        ), verts AS (
          SELECT DISTINCT src AS image_id FROM edges
        ), reach AS (
          SELECT image_id, image_id AS r FROM verts
          UNION
          SELECT re.image_id, e.dst AS r
          FROM reach re JOIN edges e ON re.r = e.src
        )
        SELECT image_id, min(r) AS cluster_id,
               (min(r) = image_id) AS is_canonical
        FROM reach GROUP BY image_id ORDER BY image_id
    """
    sqls["dedup_embedding_cluster"] = f"""
        WITH RECURSIVE pairs AS (
          SELECT vec_a, vec_b FROM ({sqls['dedup_embedding_cosine']}) q
        ), edges AS (
          SELECT vec_a AS src, vec_b AS dst FROM pairs
          UNION ALL
          SELECT vec_b AS src, vec_a AS dst FROM pairs
        ), verts AS (
          SELECT DISTINCT src AS vec_id FROM edges
        ), reach AS (
          SELECT vec_id, vec_id AS r FROM verts
          UNION
          SELECT re.vec_id, e.dst AS r
          FROM reach re JOIN edges e ON re.r = e.src
        )
        SELECT vec_id, min(r) AS cluster_id,
               (min(r) = vec_id) AS is_canonical
        FROM reach GROUP BY vec_id ORDER BY vec_id
    """
    return sqls
