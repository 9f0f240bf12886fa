"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference PPR-on-Neo4j project, re-expressed Spark-first
(see SURVEY.md). Plus LLM-data-pipeline operators: dedup, similarity search,
text analysis, multimodal columns (functions/)."""

from .config import DEFAULT_ALPHA, DEFAULT_EPSILON, DEFAULT_K
from .engine import PPREngine
from .graph import LocalGraph, PropertyGraph
from .session import build_spark
from .sources.csv_graph import load_csv_graph
from .sources.tpch_graph import load_tpch_graph

__all__ = [
    "DEFAULT_ALPHA",
    "DEFAULT_EPSILON",
    "DEFAULT_K",
    "PPREngine",
    "PropertyGraph",
    "LocalGraph",
    "build_spark",
    "load_csv_graph",
    "load_tpch_graph",
]
