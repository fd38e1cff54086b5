"""REST/JSON source — reference parity for app/ingestao_api.py:17-111.

The fetch is DRIVER-SIDE by design: the reference's API pipeline pulls tiny
dimension-style payloads (10 users / 10 posts). The retry/backoff semantics
are kept verbatim (S3/S4, SURVEY §2.1): exponential backoff capped at 8s
(16s for 429/503), ``Retry-After`` honored, (connect, read) timeouts,
``ApiError`` after exhaustion. Server-side query-param filters (S2) are the
moral equivalent of datasource predicate pushdown.

At 100 TB-scale ingestion you would implement a custom
``pyspark.sql.datasource.DataSource`` partitioned over page ranges; the
``rows_to_df`` seam below is where that plugs in.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_bra_spark.schema import all_string_schema
from data_ingestion_bra_spark.validate import ApiError

try:  # requests is optional in the runtime container; fetches are injectable
    import requests
except ImportError:  # pragma: no cover
    requests = None

_session = None


def get_session():
    """Module-global pooled HTTP session. Ref: app/ingestao_api.py:25-32."""
    global _session
    if _session is None:
        if requests is None:
            raise ApiError("requests not installed; inject a fetcher instead")
        _session = requests.Session()
    return _session


def safe_get(
    url: str,
    *,
    timeout: tuple[float, float] = (5, 30),
    retries: int = 2,
    params: dict[str, Any] | None = None,
    session=None,
    sleep=time.sleep,
):
    """Resilient GET. Ref: safe_get app/ingestao_api.py:36-56.

    Backoff 2^attempt capped at 8s (16s for 429/503); honors Retry-After.
    """
    sess = session or get_session()
    last_exc: Exception | None = None
    for attempt in range(retries + 1):
        try:
            resp = sess.get(url, params=params, timeout=timeout)
            if resp.status_code in (429, 503):
                if attempt >= retries:
                    raise ApiError(f"GET {url} -> {resp.status_code} after {retries} retries")
                retry_after = resp.headers.get("Retry-After")
                delay = float(retry_after) if retry_after else min(2.0**attempt, 16.0)
                sleep(min(delay, 16.0))
                continue
            resp.raise_for_status()
            return resp
        except ApiError:
            raise
        except Exception as exc:  # connection errors, HTTP errors
            last_exc = exc
            if attempt >= retries:
                break
            sleep(min(2.0**attempt, 8.0))
    raise ApiError(f"GET {url} failed after {retries} retries: {last_exc}")


def json_records(resp) -> list[dict[str, Any]]:
    """Parse + validate a JSON array body. Ref: app/ingestao_api.py:63-67."""
    try:
        data = resp.json()
    except Exception as exc:
        raise ApiError(f"invalid JSON response: {exc}") from exc
    if not isinstance(data, list):
        raise ApiError(f"expected JSON array, got {type(data).__name__}")
    return data


def rows_to_df(
    spark: SparkSession,
    records: list[dict[str, Any]],
    *,
    field_map: dict[str, str],
) -> DataFrame:
    """Project+rename JSON records into an all-string DataFrame.

    ``field_map``: source JSON field → output column (the reference's
    projection+rename, app/ingestao_api.py:70-77). Values are stringified
    (schema asserted later by the cast layer, not inferred here).
    """
    cols = list(field_map.values())
    data = [
        tuple(None if rec.get(src) is None else str(rec.get(src)) for src in field_map)
        for rec in records
    ]
    return spark.createDataFrame(data, schema=all_string_schema(cols))


def fetch_json_df(
    spark: SparkSession,
    base_url: str,
    endpoint: str,
    *,
    field_map: dict[str, str],
    params: dict[str, Any] | None = None,
    timeout: tuple[float, float] = (5, 30),
    retries: int = 2,
    session=None,
) -> DataFrame:
    """S1/S2: GET endpoint → DataFrame with projected/renamed columns."""
    resp = safe_get(base_url.rstrip("/") + "/" + endpoint.lstrip("/"), timeout=timeout, retries=retries, params=params, session=session)
    return rows_to_df(spark, json_records(resp), field_map=field_map)
