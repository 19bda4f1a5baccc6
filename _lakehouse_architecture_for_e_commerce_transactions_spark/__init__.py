"""PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project ``Andrew-Marfo/-Lakehouse-Architecture-for-E-Commerce-Transactions``
(an AWS Glue/Step-Functions/Athena lakehouse ETL), re-expressed idiomatically on
Spark DataFrame/SQL/Catalyst/Structured Streaming, and extended with
large-scale training-data-pipeline operators (deduplication, similarity
search, text analysis, multimodal column plumbing).

Layout:
    session     SparkSession factory tuned for local[32] dev and cluster scale
    tables      declarative TableSpec (schema, PK, partitioning, FKs) + loaders
    sources/    readers (schema-enforced CSV, parquet) and quarantine sinks
    operators/  validation, dedup, joins, merge-upsert, similarity, text ops
    functions/  column-expression helpers (hashing, vectors, text)
    plans/      explain/plan-inspection helpers
    streaming/  Structured Streaming ingest (file source -> validate -> upsert)
    etl/        the reference's three ETL jobs + orchestrator parity
"""

from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
