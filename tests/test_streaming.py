"""Structured Streaming surface: watermarked dedup, windowed politeness
counts, stateful adaptive budgets — driven with availableNow triggers
over file sources and memory sinks."""

from __future__ import annotations

import json
import os

import pytest

from snapcrawler_spark.streaming import (
    candidate_stream,
    dedup_candidates,
    host_budget_stateful,
    per_host_window_counts,
)


def _write_batch(path, rows, name):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def cand_dir(tmp_path):
    d = str(tmp_path / "cands")
    _write_batch(
        d,
        [
            {"url": "https://a.test/1", "host": "a.test", "ts": "2026-01-01T00:00:01", "status": 200},
            {"url": "https://a.test/2", "host": "a.test", "ts": "2026-01-01T00:00:02", "status": 200},
            {"url": "https://a.test/1", "host": "a.test", "ts": "2026-01-01T00:00:03", "status": 200},
            {"url": "https://b.test/1", "host": "b.test", "ts": "2026-01-01T00:00:04", "status": 503},
            {"url": "https://b.test/2", "host": "b.test", "ts": "2026-01-01T00:00:12", "status": 200},
        ],
        "batch0",
    )
    return d


def _run_available_now(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


class TestStreaming:
    def test_watermarked_dedup(self, spark, cand_dir):
        stream = dedup_candidates(candidate_stream(spark, cand_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select url from dedup_sink").collect()
        urls = sorted(r.url for r in rows)
        assert urls == [
            "https://a.test/1", "https://a.test/2",
            "https://b.test/1", "https://b.test/2",
        ]

    def test_window_counts(self, spark, cand_dir):
        stream = per_host_window_counts(candidate_stream(spark, cand_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("win_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.host, str(r.win_start)): r.n_fetches
            for r in spark.sql("select * from win_sink").collect()
        }
        assert got[("a.test", "2026-01-01 00:00:00")] == 3
        assert got[("b.test", "2026-01-01 00:00:00")] == 1
        assert got[("b.test", "2026-01-01 00:00:10")] == 1

    def test_stateful_budget(self, spark, cand_dir):
        stream = host_budget_stateful(candidate_stream(spark, cand_dir), base=8)
        _run_available_now(stream, "budget_sink")
        got = {r.host: (r.budget, r.n_err) for r in spark.sql(
            "select * from budget_sink"
        ).collect()}
        assert got["a.test"][0] == 9    # all ok → ceil(8/0.9)
        assert got["b.test"][1] >= 1    # saw the 503
        assert got["b.test"][0] <= 8    # backoff (or stayed, if split batches)
