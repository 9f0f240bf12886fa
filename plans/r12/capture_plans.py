"""Capture `.explain("formatted")` for every r12-touched query, before
and after the optimization.

"after"  = the tree as committed (driver-local kernels engage under the
           edge cutoff at sf0.1);
"before" = the same tree with SPARK_GRAFT_LOCAL_EDGE_THRESHOLD=0 (and the
           walk broadcast bound zeroed), i.e. the distributed superstep
           plans the kernels replaced.  Run each side in its OWN process:

    python plans/r12/capture_plans.py after
    SPARK_GRAFT_LOCAL_EDGE_THRESHOLD=0 python plans/r12/capture_plans.py before

For local-kernel queries the "after" plan is intentionally trivial (a
driver-parallelized scan): the evidence IS the disappearance of the
superstep Exchanges, paired with the bit-parity tests in
tests/test_r12_opt.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

KEYS = [
    # Louvain/LPA family (numpy local-moving / plurality kernels)
    "graph_lpa",
    "graph_louvain",
    "graph_louvain_weighted",
    "graph_modularity",
    "graph_conductance",
    "knn_communities",
    # components / forest / paths (r12 kernels, committed mid-build)
    "graph_scc",
    "graph_mst",
    "graph_kpaths",
    "graph_astar_multi",
    # incremental PPR (reverse-push dense kernel)
    "ppr_incremental",
    "ppr_incremental_delete",
    "ppr_incremental_mixed",
    # restart-loop / spectral family (r12 batch 2)
    "graph_articlerank",
    "graph_pagerank_weighted",
    "ppr_temporal",
    "ppr_docs",
    "pagerank_snapshots",
    "graph_eigenvector",
    "graph_hits",
    "graph_salsa",
    # walks (single-pass successor-map plan) + Luby
    "graph_walks",
    "walk_skipgrams",
    "graph_mis",
    "graph_coloring",
    # BPE corpus kernels (batch 5)
    "bpe_merges",
    "bpe_compression",
    "bpe_encode",
    "bpe_exact_apply",
    # triangle kernel (batch 6)
    "triangle_counts",
    "graph_ktruss",
    # hyperball register kernel (batch 7)
    "graph_hyperball",
]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from personalized_pagerank_algorithms_on_neo4j_spark import build_spark

    if tag == "before":
        # zero the walk fast-path bound too (it is not env-parameterised);
        # the superstep loop's own broadcast gating stays untouched
        from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
            bpe,
            walks,
        )

        walks._SINGLE_PASS_BOUND = -1
        bpe.LOCAL_TEXT_BYTES = -1
    spark = build_spark(
        app_name=f"plan_capture_{tag}", master="local[8]",
        shuffle_partitions=8,
    )
    qs = E.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for key in KEYS:
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        try:
            df = qs[key](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            body = buf.getvalue()
        except Exception as exc:  # graph_coloring raises by design at sf0.1
            body = f"(query raised during construction: {exc})\n"
        with open(path, "w") as f:
            f.write(body)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
