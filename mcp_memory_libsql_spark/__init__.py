"""PySpark-native analytics engine with the query & data-processing
capabilities of spences10/mcp-memory-libsql (knowledge-graph memory
store + vector/semantic search), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing), designed for 100 TB scale.

Everything here is expressed Spark-first: declarative DataFrame plans
that Catalyst/Tungsten can optimize (pushdown, broadcast, AQE), with
Python UDFs only where built-ins genuinely cannot express semantics.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences: `from mcp_memory_libsql_spark
    # import MemoryClient, get_spark` without importing pyspark at
    # package-import time.
    if name == "MemoryClient":
        from .api import MemoryClient

        return MemoryClient
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
