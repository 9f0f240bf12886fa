"""Capture .explain("formatted") for a set of declared queries.

Usage: python tools/capture_plans.py <outdir> <key> [<key> ...]

Writes <outdir>/<key>.txt.  Loop-based queries (Yen, Borůvka, FW-BW, the
push loops) execute their supersteps during DataFrame CONSTRUCTION, so
the captured plan is the query's TAIL plan — the loop interiors are
evidenced by the profiler's job/stage counts in OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
import __spark_entry_ext__ as X  # noqa: E402
from personalized_pagerank_algorithms_on_neo4j_spark import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def main() -> None:
    outdir = sys.argv[1]
    keys = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = build_spark(
        app_name="ppr_plans", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.range(100).groupBy((F.col("id") % 7).alias("k")).count().collect()
    fns = E.queries()
    for key in keys:
        fn = fns[key]
        df = fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{key}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {key} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
