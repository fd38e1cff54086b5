"""Golden-parity replay: run OUR CSV pipeline over the reference's actual
committed input file and assert against the reference's committed bronze
manifest (row count, null density, dtype classes, sampled values).

Reference input:  data-lake/temp/IBC_municipios_indicadores_normalizados.csv
Reference golden: data-lake/bronze/tb_indicadores_municipio/anomesdia=20251020/
                  indmunicipios.txt.manifest.json (schema_stats)
"""

from __future__ import annotations

import json
import os
from datetime import date

import pytest

from pyspark.sql import functions as F

from data_ingestion_bra_spark.pipelines import ingest_csv

REF = "/root/reference"
REF_CSV = f"{REF}/data-lake/temp/IBC_municipios_indicadores_normalizados.csv"
REF_MANIFEST = (
    f"{REF}/data-lake/bronze/tb_indicadores_municipio/anomesdia=20251020/"
    "indmunicipios.txt.manifest.json"
)

COLUMN_MAP = {
    "Ano": "ano",
    "Código Município": "codigo_municipio",
    "Município": "municipio",
    "UF": "uf",
    "IBC": "ibc",
    "Cobertura Pop. 4G5G": "cobertura_pop_4g5g",
    "Densidade SMP": "densidade_smp",
    "HHI SMP": "hhi_smp",
    "Densidade SCM": "densidade_scm",
    "HHI SCM": "hhi_scm",
    "Adensamento Estações": "adensamento_estacoes",
    "Fibra": "fibra",
    "Cobertura área agricultável": "cobertura_area_agricultavel",
}
FLOAT_COLS = [
    "ibc",
    "cobertura_pop_4g5g",
    "densidade_smp",
    "hhi_smp",
    "densidade_scm",
    "hhi_scm",
    "adensamento_estacoes",
    "fibra",
    "cobertura_area_agricultavel",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CSV), reason="reference data not present"
)


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    cfg = {
        "csv": {"path": REF_CSV, "delimiter": ";", "encoding": "utf-8", "has_header": True},
        "columns_normalization": COLUMN_MAP,
        "schema": {
            "required_columns": list(COLUMN_MAP.values()),
            "integer_fields": ["ano"],
            "string_fields": ["codigo_municipio", "municipio", "uf"],
            "float_fields": FLOAT_COLS,
        },
        "output": {
            "base_dir": str(tmp / "bronze"),
            "table": "tb_indicadores_municipio",
            "partition_key": "anomesdia",
            "filename": "indmunicipios.txt",
        },
    }
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(json.dumps(cfg), encoding="utf-8")
    res = ingest_csv.run(spark, str(cfg_path), run_date=date(2025, 10, 20), show_preview=False)
    golden = json.load(open(REF_MANIFEST))["schema_stats"]
    ours = json.load(open(res["manifest"]))["schema_stats"]
    return res, golden, ours


def test_row_count_matches_golden(replay):
    _res, golden, ours = replay
    assert ours["linhas"] == golden["linhas"] == 22280


def test_null_counts_match_golden(replay):
    _res, golden, ours = replay
    assert ours["nulos"] == golden["nulos"]  # incl. 16,723 in cobertura_area_agricultavel


def test_dtype_classes_match_golden(replay):
    _res, golden, ours = replay
    # pandas dtype → Spark dtype class mapping (SURVEY §1.2)
    mapping = {"Int64": "bigint", "object": "string", "float64": "double"}
    assert ours["dtypes"] == {c: mapping[t] for c, t in golden["dtypes"].items()}
    assert ours["colunas"] == golden["colunas"]


def test_sampled_values_match_reference_output(replay, spark):
    """Spot-check parsed values against the reference's committed bronze TXT
    (same rows, independently parsed)."""
    res, _golden, _ours = replay
    ref_bronze = (
        spark.read.options(sep=";", header=True, multiLine=True, encoding="UTF-8")
        .csv(
            f"{REF}/data-lake/bronze/tb_indicadores_municipio/anomesdia=20251020/indmunicipios.txt"
        )
    )
    ours = res["df"]
    # codigo_municipio keeps leading zeros (string, SURVEY §1.2)
    ref_sample = {
        r["codigo_municipio"]: (r["municipio"], r["ibc"], r["cobertura_area_agricultavel"])
        for r in ref_bronze.orderBy("codigo_municipio").limit(50).collect()
    }
    ours_sample = {
        r["codigo_municipio"]: (
            r["municipio"],
            None if r["ibc"] is None else str(r["ibc"]),
            None if r["cobertura_area_agricultavel"] is None else str(r["cobertura_area_agricultavel"]),
        )
        for r in ours.orderBy("codigo_municipio").limit(50).collect()
    }
    assert set(ref_sample) == set(ours_sample)
    for k, (muni, ibc, cob) in ref_sample.items():
        o_muni, o_ibc, o_cob = ours_sample[k]
        assert o_muni == muni
        # reference bronze stores floats as pandas repr; compare numerically
        assert (o_ibc is None) == (ibc in (None, ""))
        if ibc not in (None, ""):
            assert abs(float(o_ibc) - float(ibc)) < 1e-9
        if cob in (None, ""):
            assert o_cob is None
        else:
            assert abs(float(o_cob) - float(cob)) < 1e-9
