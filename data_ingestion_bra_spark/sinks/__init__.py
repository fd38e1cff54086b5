from data_ingestion_bra_spark.sinks.writer import write_partitioned

__all__ = ["write_partitioned"]
