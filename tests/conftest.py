from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import personalized_pagerank_algorithms_on_neo4j_spark as P  # noqa: E402

GOT_NODES = "/root/reference/dataset/got/GOT_Nodes.csv"
GOT_RELS = "/root/reference/dataset/got/GOT_Rels.csv"
SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = P.build_spark(app_name="ppr_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def got(spark):
    return P.load_csv_graph(spark, GOT_NODES, GOT_RELS)


@pytest.fixture(scope="session")
def got_adj(got):
    """Driver-side dict adjacency for the independent reference impls."""
    lg = got.local
    out_adj = {
        int(v): [int(u) for u in lg.indices[lg.indptr[v] : lg.indptr[v + 1]]]
        for v in range(lg.n)
    }
    in_adj = {
        int(v): [int(u) for u in lg.rindices[lg.rindptr[v] : lg.rindptr[v + 1]]]
        for v in range(lg.n)
    }
    return out_adj, in_adj


@pytest.fixture(scope="session")
def tpch_graph(spark):
    return P.load_tpch_graph(spark, SF_SMALL)


def dense_of(lg, reserve_dict):
    """dict keyed by dense id -> dense np array."""
    pi = np.zeros(lg.n)
    for k, v in reserve_dict.items():
        pi[k] = v
    return pi


def df_to_dict(df):
    return {r["node"]: r["ppr"] for r in df.collect()}
