"""Smoke test for the spark-submit entry point (jobs/crawl.py) — the
deployment surface the north rule names (`spark-submit --py-files
engine.zip jobs/crawl.py`). Runs the script in a FRESH interpreter
(its own SparkSession, like a submitted driver), pointed at the xs
fixture written to parquet, and checks the one-line JSON result plus
the catalog it leaves behind."""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"


class TestSparkSubmitEntry:
    def test_jobs_crawl_wave_smoke(self, web_xs, tmp_path):
        from snapcrawler_spark.io import write_fixture_parquet

        web_dir = tmp_path / "web"
        write_fixture_parquet(web_xs, str(web_dir))
        out_dir = tmp_path / "cat"
        proc = subprocess.run(
            [
                sys.executable, "jobs/crawl.py",
                "--web", str(web_dir),
                "--out", str(out_dir),
                "--max-waves", "16",
                "--host-budget", "0",
            ],
            capture_output=True, text=True, timeout=420, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        res = json.loads(line)
        assert res["mode"] == "wave"
        assert res["total_fetched"] > 0
        assert res["accepted"] > 0
        assert res["waves"] >= 1
        # per-wave lineage counters made it into the result
        assert len(res["metrics"]) == res["waves"]
        assert res["stats"]["fetched"] == res["total_fetched"]
        # the snapshot catalog was committed (accepted table readable)
        assert (out_dir / "accepted").exists()
