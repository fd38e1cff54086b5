from data_ingestion_bra_spark.functions.cleaning import (
    apply_casts,
    clean_dataframe,
    to_float_pt,
    to_int,
    to_str,
)

__all__ = ["to_int", "to_str", "to_float_pt", "apply_casts", "clean_dataframe"]
