"""reshape_on_flink_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference system (Apache Flink 1.13 + the Reshape adaptive
skew-handling mechanism), re-expressed Spark-first:

- batch relational core     -> DataFrame / Spark SQL (Catalyst + Tungsten + AQE)
- streaming core            -> Structured Streaming (watermarks, windows, state)
- skew handling ("Reshape") -> AQE skew splitting (batch) + adaptive key
                               salting with an explicit merge stage (streaming)
- LLM-data-pipeline ops     -> dedup / similarity / text / multimodal over
                               DataFrames, designed for 100 TB partitioning

The engine deliberately owns NO execution machinery: every logical plan is
declared via the DataFrame/SQL API so Catalyst can push down filters, prune
columns, pick join strategies, and re-plan at runtime (AQE). Custom Python
code appears only where Spark has no built-in operator (documented per
module), and then always as Arrow-vectorized pandas UDFs.
"""

from reshape_on_flink_spark.session import EngineSession, get_spark

__all__ = ["EngineSession", "get_spark"]
__version__ = "0.1.0"
