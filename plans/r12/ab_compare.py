"""Interleaved A/B timing of every r12-touched query: local kernels ON
(the committed tree) vs OFF (every module's LOCAL_EDGE_THRESHOLD zeroed,
plus the walk single-pass bound), in ONE process so substrate caches and
host state are shared.  min-of-2 per mode per key, modes interleaved
(ON, OFF, ON, OFF) so bursty host steal hits both fairly.

    python plans/r12/ab_compare.py            # sf0.1, local[32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from personalized_pagerank_algorithms_on_neo4j_spark import (  # noqa: E402
    build_spark,
    graph as gmod,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions import (  # noqa: E402
    bpe as bmod,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions import (  # noqa: E402
    graphstats as gsmod,
)
from personalized_pagerank_algorithms_on_neo4j_spark.functions import (  # noqa: E402
    walks as wmod,
)
from personalized_pagerank_algorithms_on_neo4j_spark.operators import (  # noqa: E402
    astar,
    dynamic_ppr,
    eigenvector,
    kpaths,
    louvain,
    lpa,
    mis,
    mst,
    pagerank,
    scc,
)

MODS = [gmod, louvain, lpa, mst, scc, kpaths, astar, dynamic_ppr, mis,
        pagerank, eigenvector, gsmod]

KEYS = [
    "graph_lpa", "graph_louvain", "graph_louvain_weighted",
    "graph_louvain_refined", "graph_modularity", "graph_conductance",
    "knn_communities", "graph_scc", "graph_mst", "graph_kpaths",
    "graph_astar_multi", "ppr_incremental", "ppr_incremental_delete",
    "ppr_incremental_mixed",
    "graph_articlerank", "graph_pagerank_weighted", "ppr_temporal",
    "ppr_docs", "pagerank_snapshots", "graph_eigenvector", "graph_hits",
    "graph_salsa", "graph_walks", "walk_skipgrams", "graph_mis",
    "bpe_merges", "bpe_compression", "bpe_encode", "bpe_exact_apply",
    "triangle_counts", "graph_ktruss", "graph_hyperball",
]


def set_mode(on: bool) -> None:
    for m in MODS:
        m.LOCAL_EDGE_THRESHOLD = 8_000_000 if on else -1
    wmod._SINGLE_PASS_BOUND = 1_000_000 if on else -1
    bmod.LOCAL_TEXT_BYTES = 256 * 1024 * 1024 if on else -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        app_name="ab_compare", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    qs = E.queries()
    results: dict[str, dict[str, float]] = {}
    for key in KEYS:
        fn = qs[key]
        best = {"on": None, "off": None}
        for _ in range(2):
            for mode in ("on", "off"):
                set_mode(mode == "on")
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                if best[mode] is None or dt < best[mode]:
                    best[mode] = dt
        set_mode(True)
        results[key] = {k: round(v, 2) for k, v in best.items()}
        print(f"[ab] {key} on={best['on']:.2f}s off={best['off']:.2f}s",
              file=sys.stderr, flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
