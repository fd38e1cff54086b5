"""Query registry: every operator the engine claims gets a named Spark
builder and (where SQL-expressible) a DuckDB oracle twin.

Conventions that keep the driver's order-insensitive value-hash compare green
(see /root/repo/__spark_entry__.py docstring):

- every computed column is aliased IDENTICALLY in the Spark builder and the
  oracle SQL;
- double aggregates whose value depends on summation order are rounded the
  same way on both sides (money → 2 dp, ratios/cosines → 4 dp);
- DuckDB ``sum(BIGINT)`` returns HUGEINT — oracles cast back to BIGINT to
  match Spark's long;
- temporal outputs are formatted to strings on both sides so engine-native
  date/timestamp repr differences can't leak into the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from data_ingestion_bra_spark.plans import (  # noqa: F401
        llm_ops,
        relational,
        relational_ext,
        temporal,
    )


def get_queries() -> dict[str, Builder]:
    _load_all()
    return {name: spec.builder for name, spec in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
