"""monday_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL+analytics system
(frugiu/monday-etl), re-expressed Spark-first.

Layout:
  session.py   SparkSession factory tuned for local[32] testing, cluster-ready
  io.py        parquet sources/sinks, snapshot+historical dual-write
  catalog.py   explicit StructType schemas for the 5 reference tables
  normalize.py nested-JSON flatten + EAV->wide mapping (reference transform layer)
  functions.py scalar function layer (F-1..F-14 of SURVEY.md §2.8)
  operators/   relational operator builders (filters/joins/aggs/windows/setops)
  queries/     the query registry: name -> (spark_fn, oracle_sql) pairs
  extensions/  beyond-reference ops: dedup, similarity search, text analysis,
               multimodal plumbing
  streaming/   Structured Streaming flavor of the snapshot pipeline
"""

__version__ = "0.1.0"
