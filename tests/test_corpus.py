"""Corpus pipeline lineage (pipeline/corpus.py): the corpus_reasons
rejections table must partition the corpus against corpus_build at
every config point, honor the documented reason precedence, and carry
the responsible keeper ids."""

from __future__ import annotations

import pandas as pd
import pytest

from snapcrawler_spark.pipeline import corpus as C

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "cfg", [None, C.ALT_CONFIG, C.REP_CONFIG], ids=["default", "alt", "rep"]
)
def test_reasons_complement_build(spark, cfg):
    """|corpus_build| + |corpus_reasons| == |documents| — every doc is
    either kept or carries exactly one drop reason."""
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    built = C.corpus_build(spark, SF_DIR, cfg).count()
    reasons = C.corpus_reasons(spark, SF_DIR, cfg).collect()
    assert built + len(reasons) == total
    assert len({r.doc_id for r in reasons}) == len(reasons)
    for r in reasons:
        if r.reason in ("dropped_exact", "dropped_near_dup"):
            assert r.keeper_doc_id >= 0
        else:
            assert r.keeper_doc_id == -1


def test_alt_config_is_a_different_nonvacuous_point(spark):
    d = C.corpus_build(spark, SF_DIR).collect()
    a = C.corpus_build(spark, SF_DIR, C.ALT_CONFIG).collect()
    assert a, "ALT_CONFIG selects nothing — vacuous second config point"
    assert {r.doc_id for r in d} != {r.doc_id for r in a}
    assert all(r.lang_pred == C.ALT_CONFIG.keep_lang for r in a)


def test_rep_config_drops_and_keeps(spark):
    """The repetition gate (REP_CONFIG.max_top2gram_frac_e4) is a
    non-vacuous third config point: at least one doc that survives the
    default config is dropped with reason 'dropped_repetition', clean
    docs survive, and repetition is LAST in reason precedence (docs
    failing an earlier stage keep that stage's reason)."""
    from snapcrawler_spark.pipeline.text import raw_top2gram

    default_kept = {r.doc_id for r in C.corpus_build(spark, SF_DIR).collect()}
    rep_kept = {
        r.doc_id for r in C.corpus_build(spark, SF_DIR, C.REP_CONFIG).collect()
    }
    assert rep_kept, "REP_CONFIG selects nothing — vacuous"
    assert rep_kept < default_kept  # strictly tighter, same other knobs
    reasons = {
        r.doc_id: r.reason
        for r in C.corpus_reasons(spark, SF_DIR, C.REP_CONFIG).collect()
    }
    rep_dropped = {d for d, r in reasons.items() if r == "dropped_repetition"}
    assert rep_dropped == default_kept - rep_kept
    # every rep-dropped doc really exceeds the threshold; every kept
    # doc really does not
    top2 = {
        r.doc_id: r.top2gram_frac_e4
        for r in raw_top2gram(spark, SF_DIR).collect()
    }
    thr = C.REP_CONFIG.max_top2gram_frac_e4
    assert all(top2[d] > thr for d in rep_dropped)
    assert all(top2[d] <= thr for d in rep_kept)


def test_repetition_gate_metrics(spark):
    """Seeded variants make every repetition metric non-vacuous, and the
    seeded values are exactly derivable: a %5 doc not also %7 has
    dup_line_frac_e4 == 5000 (two identical lines); a %7 doc has
    symbols; an untouched doc has neither."""
    from snapcrawler_spark.pipeline.text import repetition

    rows = {r.doc_id: r for r in repetition(spark, SF_DIR).collect()}
    assert rows
    for d, r in rows.items():
        if d % 5 == 0 and d % 7 != 0:
            assert r.n_lines == 2 and r.dup_line_frac_e4 == 5000
        elif d % 5 != 0:
            assert r.n_lines == 1 and r.dup_line_frac_e4 == 0
        if d % 7 == 0:
            assert r.symbol_word_ratio_e4 > 0
        else:
            assert r.symbol_word_ratio_e4 == 0
        assert r.top2gram_frac_e4 > 0  # bounded vocab -> always repeats


def test_exact_precedes_near_dup_and_keeper_ids(spark, tmp_path):
    """Byte-identical texts are ALSO minhash near-dups (identical
    signatures), so the copy doc fails both stages — the reasons table
    must pick dropped_exact (stage order) and point at the exact
    keeper, while a kept doc's near-dup satellites point at the cluster
    canonical."""
    en = (
        "the quick brown fox and the lazy dog of the old farm with a "
        "kind heart and a long road to the far hills in the morning "
    )
    rows = []
    # d0/d1: byte-identical (d1 → dropped_exact, keeper 0)
    rows.append((0, en * 4, "en"))
    rows.append((1, en * 4, "en"))
    # d2: unique survivor
    rows.append((2, en * 4 + "every extra word counts here today", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["source"] = "t"
    root = str(tmp_path / "docs")
    import os

    os.makedirs(root, exist_ok=True)
    pdf.to_parquet(f"{root}/documents.parquet", index=False)

    reasons = {
        r.doc_id: (r.reason, r.keeper_doc_id)
        for r in C.corpus_reasons(spark, root).collect()
    }
    assert reasons[1] == ("dropped_exact", 0)
    built = {r.doc_id for r in C.corpus_build(spark, root).collect()}
    assert 1 not in built
    assert built | set(reasons) == {0, 1, 2}


class TestShardPack:
    def test_prefix_sum_matches_pandas_cumsum(self, spark):
        from pyspark.sql import functions as F

        from snapcrawler_spark.operators.order import prefix_sum

        df = spark.range(200).select(
            F.col("id").alias("k"), ((F.col("id") * 7) % 13 + 1).alias("v")
        )
        pdf = df.orderBy("k").toPandas()
        want_incl = pdf["v"].cumsum().tolist()
        want_excl = [0] + want_incl[:-1]
        got_incl = (
            prefix_sum(df, ["k"], "v", out_col="p")
            .orderBy("k")
            .select("p")
            .toPandas()["p"]
            .tolist()
        )
        got_excl = (
            prefix_sum(df, ["k"], "v", out_col="p", exclusive=True)
            .orderBy("k")
            .select("p")
            .toPandas()["p"]
            .tolist()
        )
        assert got_incl == want_incl
        assert got_excl == want_excl

    def test_prefix_sum_windows_are_partitioned(self, spark):
        """Scale pin: every window in the prefix-sum plan is partitioned
        (by the range-partition id) — no global single-partition
        window at any corpus size."""
        from pyspark.sql import functions as F

        from snapcrawler_spark.operators.order import prefix_sum

        df = spark.range(50).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        out = prefix_sum(df, ["k"], "v", out_col="p")
        plan = out._jdf.queryExecution().executedPlan().toString()
        win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
        assert win_lines, "expected a Window node in the plan"
        assert all("__pid" in ln for ln in win_lines), win_lines

    def test_shard_pack_invariants(self, spark):
        """Shards are contiguous in doc order, every shard's exclusive
        prefix range sits inside [shard*B, (shard+1)*B), and token
        counts match the text_token_count definition."""
        rows = C.shard_pack(spark, SF_DIR, budget_tokens=512).collect()
        assert rows == sorted(rows, key=lambda r: r.doc_id)
        shard_ids = [r.shard_id for r in rows]
        assert shard_ids == sorted(shard_ids)  # non-decreasing
        assert shard_ids[0] == 0
        prefix = 0
        for r in rows:
            assert r.shard_id == prefix // 512
            prefix += r.n_tokens
        assert shard_ids[-1] >= 1  # the budget actually splits sf0.001


class TestInterleave:
    def test_interleave_invariants(self, spark):
        rows = C.interleave(spark, SF_DIR).collect()
        n = len(rows)
        # dense permutation 1..n
        assert sorted(r.interleave_seq for r in rows) == list(range(1, n + 1))
        # each language's stream keeps its internal order
        by_lang: dict = {}
        for r in sorted(rows, key=lambda r: r.r):
            by_lang.setdefault(r.lang, []).append(r.interleave_seq)
        for seqs in by_lang.values():
            assert seqs == sorted(seqs)
        # the 3x-downweighted language (en) is under-represented in the
        # stream's first half relative to its corpus share
        en_share = sum(1 for r in rows if r.lang == "en") / n
        first_half = sorted(rows, key=lambda r: r.interleave_seq)[: n // 2]
        en_first = sum(1 for r in first_half if r.lang == "en") / len(first_half)
        assert en_first < en_share


class TestPipelinePack:
    def test_full_chain_invariants(self, spark):
        built = {r.doc_id for r in C.corpus_build(spark, SF_DIR).collect()}
        rows = C.pipeline_pack(spark, SF_DIR, budget_tokens=1024).collect()
        # exactly the corpus_build survivors, packed
        assert {r.doc_id for r in rows} == built
        # interleave_seq is a dense permutation and shards are
        # contiguous budget-bounded prefixes of the INTERLEAVE order
        ordered = sorted(rows, key=lambda r: r.interleave_seq)
        assert [r.interleave_seq for r in ordered] == list(
            range(1, len(rows) + 1)
        )
        prefix = 0
        for r in ordered:
            assert r.shard_id == prefix // 1024
            prefix += r.n_tokens
        # upweighted sources (src0-4 at 3x) are over-represented in the
        # stream's first half relative to their survivor share
        up = {f"src{i}" for i in range(5)}
        share = sum(1 for r in rows if r.source in up) / len(rows)
        half = ordered[: len(rows) // 2]
        share_first = sum(1 for r in half if r.source in up) / len(half)
        assert share_first > share
