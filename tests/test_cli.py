"""O1: the CLI entrypoint, end to end in a subprocess (its own Spark
session — kept to ONE invocation for suite-time reasons)."""

from __future__ import annotations

import pytest
import subprocess
import sys
from pathlib import Path

pytestmark = pytest.mark.slow  # heavyweight e2e: see pytest.ini / README two-tier loop

REPO = Path(__file__).resolve().parent.parent
GOT_NODES = "/root/reference/dataset/got/GOT_Nodes.csv"
GOT_RELS = "/root/reference/dataset/got/GOT_Rels.csv"


def test_cli_single_query():
    out = subprocess.run(
        [
            sys.executable, "-m", "personalized_pagerank_algorithms_on_neo4j_spark",
            "--nodes", GOT_NODES, "--rels", GOT_RELS,
            "--single", "Eddard", "--algo", "power", "--k", "5",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the source node dominates its own PPR and the name join resolved
    assert "Eddard" in out.stdout
    assert "ppr" in out.stdout
