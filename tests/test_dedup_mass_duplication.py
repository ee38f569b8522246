"""Round-7 candidate-bound discipline (VERDICT r6 what's-wrong #1-#2):
under mass duplication — B byte-identical docs — the near-dup candidate
generators must do work proportional to DISTINCT fingerprints /
signatures, never LSH_BANDS·B²; the B²/2 intra-group pairs the output
itself demands come from a direct group equi-join. Gates: (a) outputs
under mass duplication still match the frozen DuckDB oracles exactly,
(b) the candidate relations are invariant in B."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from snapcrawler_spark.pipeline.dedup import (
    _minhash_sig_pairs,
    _simhash_fp_pairs,
    _simhash_unordered,
    dedup_minhash_lsh,
    dedup_simhash,
    minhash_signatures_wide,
    N_MINHASH,
)

TEMPLATE = (
    "the quick brown fox jumps over the lazy dog while the cat naps "
    "quietly near the warm stove in the old kitchen"
)
VARIANT = (
    "the quick brown fox jumps over the lazy dog while the cat naps "
    "quietly near the warm stove in the new kitchen"
)
OTHERS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven twelve",
    "completely different words about sailing ships across cold seas",
]


def _write_docs(spark, path: str, n_copies: int) -> str:
    rows = [(i, TEMPLATE) for i in range(n_copies)]
    rows.append((10_000, VARIANT))
    rows += [(20_000 + i, t) for i, t in enumerate(OTHERS)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


class TestMassDuplication:
    @pytest.fixture(scope="class")
    def corpus(self, spark, tmp_path_factory):
        return _write_docs(
            spark, str(tmp_path_factory.mktemp("massdup")), 60
        )

    def _oracle(self, corpus: str, sql_name: str):
        import __spark_entry__ as em

        con = duckdb.connect()
        # Spark writes the table as a directory of part files
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{corpus}/documents.parquet/*.parquet')"
        )
        return con.sql(em.oracle_sql()[sql_name]).fetchall()

    def test_simhash_output_matches_oracle_under_mass_dup(
        self, spark, corpus
    ):
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in dedup_simhash(spark, corpus).collect()
        }
        want = {tuple(r) for r in self._oracle(corpus, "dedup_simhash")}
        assert got == want
        # the 60 identical copies alone contribute C(60,2) zero-distance
        # pairs — the quadratic part of the OUTPUT, not of the join
        assert len([p for p in got if p[2] == 0]) >= 60 * 59 // 2

    def test_minhash_output_matches_oracle_under_mass_dup(
        self, spark, corpus
    ):
        got = {
            (r.doc_a, r.doc_b, r.n_agree)
            for r in dedup_minhash_lsh(spark, corpus).collect()
        }
        want = {tuple(r) for r in self._oracle(corpus, "dedup_minhash_lsh")}
        assert got == want

    def test_simhash_candidates_invariant_in_duplication(
        self, spark, tmp_path
    ):
        """The pigeonhole join consumes DISTINCT fingerprints: B=3 and
        B=120 corpora (same distinct texts) must produce the identical
        fp-pair relation — O(distinct²), not O(B²)."""
        counts = {}
        for b in (3, 120):
            path = _write_docs(spark, str(tmp_path / f"b{b}"), b)
            fps = (
                _simhash_unordered(spark, path)
                .select("simhash")
                .distinct()
            )
            pairs = _simhash_fp_pairs(fps, 3).collect()
            counts[b] = sorted(
                (r.sh_a, r.sh_b, r.hamming) for r in pairs
            )
        assert counts[3] == counts[120]

    def test_minhash_candidates_invariant_in_duplication(
        self, spark, tmp_path
    ):
        """Band buckets are built over distinct signatures: candidate
        sig pairs are invariant in the copy count."""
        counts = {}
        for b in (3, 120):
            path = _write_docs(spark, str(tmp_path / f"mb{b}"), b)
            wide = minhash_signatures_wide(spark, path)
            mh_cols = [f"mh{i}" for i in range(N_MINHASH)]
            sig_key = F.md5(
                F.concat_ws(
                    ",", *[F.col(c).cast("string") for c in mh_cols]
                )
            )
            grp = (
                wide.select(sig_key.alias("sig_key"), *mh_cols)
                .groupBy("sig_key")
                .agg(*[F.min(c).alias(c) for c in mh_cols])
            )
            pairs = _minhash_sig_pairs(grp, int(0.5 * N_MINHASH)).collect()
            counts[b] = sorted((r.ka, r.kb, r.n_agree) for r in pairs)
        assert counts[3] == counts[120]
