"""Suite-only benchmark harness for optimization iteration (guide §1.4).

Replicates bench.py's run_query_suite methodology exactly — same session
confs (get_spark at local[$SPARK_GRAFT_CPUS], shuffle_partitions CPUS*2),
same noop sink, same per-query wall timing — without the headline legs or
the named pair, so a full-suite measurement costs ~1-2 min instead of
~20-40. bench.py itself stays FROZEN for the driver.

Usage:
    python bench_extra.py                 # all queries, one pass
    python bench_extra.py q1 q2 ...       # subset
    SPARK_GRAFT_SUITE_REPEATS=3 python bench_extra.py q1   # repeats

Prints one JSON line: {"queries": {...}, "loads": {...}, "cpus": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SUITE_REPEATS", "1"))


def main():
    only = set(sys.argv[1:])
    import __spark_entry__ as E
    from pgsql2osm_spark.session import get_spark

    spark = get_spark(
        app="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    loads = {"before": round(os.getloadavg()[0], 1)}
    timings: dict[str, list[float]] = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"suite:{name}")
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                samples.append(round(time.perf_counter() - t0, 3))
            except Exception as ex:
                print(f"bench_extra: query {name} failed: {ex}", file=sys.stderr)
                samples.append(-1.0)
                break
        timings[name] = samples
    loads["after"] = round(os.getloadavg()[0], 1)
    spark.stop()
    out = {
        "queries": {k: v[0] for k, v in timings.items()},
        "samples": timings,
        "total": round(sum(v[0] for v in timings.values() if v[0] > 0), 2),
        "loads": loads,
        "cpus": CPUS,
        "sf": SF_DIR,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
