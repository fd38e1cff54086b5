from data_ingestion_bra_spark.plans.registry import QUERIES, QuerySpec, get_queries, get_oracle_sql

__all__ = ["QUERIES", "QuerySpec", "get_queries", "get_oracle_sql"]
