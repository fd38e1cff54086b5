"""data_ingestion_bra_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference repo ``brunawho/data-ingestion-bra`` (see /root/repo/SURVEY.md), and
extends it with the relational tier Spark provides for free (joins, group-by,
windows, set ops) plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

All transforms are declarative DataFrame/Column expressions so Catalyst can
push down predicates, prune columns, and keep everything inside whole-stage
codegen; Python UDFs are used nowhere in the reference-parity tier.
"""

__version__ = "0.1.0"
