"""Observations riding lazily-checkpointed plans — the Spark 4 hazard
the wave loop's checkpoint folds must design around.

``Dataset.localCheckpoint(eager=False)`` still goes through
``withAction``, so a QueryExecution success event fires at CREATION
time and ``ObservationManager.tryComplete`` matches any CollectMetrics
node in the checkpointed plan. Two regimes (probed empirically on
Spark 4.1; see BENCH/notes.md round-5 section):

- plan HAS an exchange → it is AdaptiveSparkPlan-wrapped, and getting
  its RDD executes every INTERMEDIATE query stage eagerly at creation;
  only the final result stage defers to the consuming action. A riding
  observation resolves with the TRUE value iff its CollectMetrics node
  sits BELOW the last exchange (inside a stage executed at creation);
  a node ABOVE the last exchange is in the unexecuted final stage and
  the creation event latches a RACY value — whatever the accumulator
  holds when the async listener bus processes the event (measured both
  0 and the true count across identical runs).
- plan has NO exchange → creation runs zero jobs (fully lazy), but the
  event carries the never-executed CollectMetricsExec's ZERO row —
  deterministic permanent corruption; a later real action cannot
  repair it (``Observation`` is first-wins).

The engine's invariant: every ``localCheckpoint(eager=False)`` call
keeps all riding observations BELOW the checkpointed plan's last
exchange (md5 fold: obs_sel/obs_ok/obs_blocked under the md5 window),
or guarantees an earlier real execution resolved them (bloom/cuckoo:
the eager cogroup checkpoint) — and the EXACT-backend seen probe stays
eager because obs_cands sits above the candidate window. These tests
pin every regime so a refactor — or a Spark upgrade changing the event
behavior — fails loudly instead of silently zeroing lineage counters.
"""

from __future__ import annotations

from pyspark.sql import Observation, Window
from pyspark.sql import functions as F


def _obs_value(obs: Observation) -> int:
    row = obs.get
    return int(row["n"])


class TestLazyCheckpointObservations:
    def test_narrow_lazy_checkpoint_zeroes_riding_observation(self, spark):
        """The hazard itself: a NO-exchange plan lazily checkpointed
        completes a riding observation with 0 at creation, and the
        value stays 0 even after a real action. If this test ever
        fails with 50 == 50, Spark fixed the creation-event leak and
        the engine's exchange-shape invariant can be relaxed."""
        obs = Observation()
        df = spark.range(50).observe(obs, F.count(F.lit(1)).alias("n"))
        ck = df.where("id % 2 = 0").localCheckpoint(eager=False)
        # read BEFORE any action: the creation event is the only one in
        # flight, so the latched value is deterministically 0 (reading
        # after an action would race the async listener bus against the
        # accumulator updates)
        assert _obs_value(obs) == 0
        ck.write.format("noop").mode("overwrite").save()
        df.write.format("noop").mode("overwrite").save()
        assert _obs_value(obs) == 0

    def test_observation_below_last_exchange_survives_lazy_checkpoint(
        self, spark
    ):
        """The md5-fold shape: the fetch-side observation (obs_sel
        analog) sits BELOW the md5 window's exchange inside the lazily
        checkpointed delta plan, so it lands in an intermediate query
        stage that AQE executes at creation — the count resolves with
        the TRUE value."""
        from snapcrawler_spark.operators.seen import ExactSeenSet

        obs = Observation()
        fetch_side = (
            spark.range(40)
            .select(
                F.concat(F.lit("https://h"), F.col("id") % 4,
                         F.lit(".test/p/"), "id").alias("url"),
                (F.col("id") % 4).alias("k"),
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))  # below the window
        )
        w = Window.partitionBy("k").orderBy("url")
        firsts = (
            fetch_side.withColumn("rk", F.row_number().over(w))
            .where("rk <= 9")
        )
        seen = ExactSeenSet(spark)
        delta = seen.probe_new(firsts, assume_unique=True, eager=False)
        assert _obs_value(obs) == 40
        assert delta.count() == 36

# NOTE deliberately untested: an observation attached ABOVE the lazy
# checkpoint's last exchange (the wave's obs_cands-over-the-candidate-
# window shape) is RACY, not reliably zero — the creation event
# completes it with whatever the final-stage metric accumulator holds
# when the async listener bus processes the event. Measured across
# runs of the identical shape: 0 (twice) and the true count (twice).
# A test asserting either value flakes; the deterministic pins above
# plus the isinstance guard in plans/wave_crawl.py (EXACT-backend seen
# probe stays eager) are the protection.

    def test_bloom_lazy_delta_keeps_observation_exact(self, spark):
        """Bloom path: the eager cogroup state checkpoint executes the
        candidate scan BEFORE the lazy delta is created, so a riding
        candidate count resolves from that real execution — the delta's
        creation event cannot zero it (first-wins already settled)."""
        from snapcrawler_spark.operators.seen import BloomSeenSet

        obs = Observation()
        cands = spark.range(30).select(
            F.concat(F.lit("https://h"), F.col("id") % 3,
                     F.lit(".test/p/"), "id").alias("url")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        bloom = BloomSeenSet(spark, partitions=4, m_bits=1 << 13)
        delta = bloom.probe_new(cands, assume_unique=True, eager=False)
        assert _obs_value(obs) == 30
        assert delta.count() == 30
