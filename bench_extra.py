#!/usr/bin/env python
"""Extra measurement harness for the optimization rounds (bench.py is
FROZEN for the driver's measurement; all exploratory numbers cited in
OPTIMIZATION_r*.md come from here).

Modes:
  python bench_extra.py --queries [sf_dir] [name ...] [--trials N]
      Time each query with the noop sink (guide §1.4), one shared
      session, job-labeled (guide §1.5). Prints one JSON line.
  python bench_extra.py --plans <outdir> [sf_dir] [name ...]
      Write .explain("formatted") for each query to <outdir>/<name>.txt.

The session setup mirrors bench.py exactly (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=32) so numbers are comparable with the driver's.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _get_spark():
    from snapcrawler_spark.session import get_spark, stop_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    cores = int(cpus) if cpus else None
    stop_spark()
    return get_spark("bench_extra", cores=cores, shuffle_partitions=32)


def main() -> None:
    import __spark_entry__ as em

    args = [a for a in sys.argv[1:]]
    mode = "--queries"
    if args and args[0].startswith("--"):
        mode = args.pop(0)
    outdir = None
    if mode == "--plans":
        outdir = args.pop(0)
    trials = 1
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else (
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    names = args or list(em.queries().keys())

    spark = _get_spark()
    qs = em.queries()

    if mode == "--plans":
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}", file=sys.stderr)
        return

    out: dict[str, list[float]] = {}
    for t in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "trials": trials,
                "secs": out,
                "min": {k: min(v) for k, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
