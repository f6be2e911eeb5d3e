"""extract_job (§3.2): parse-only pipeline over an existing
documents_interleaved table — Scan -> mapInPandas -> metadata, no shuffle.

This is the pytest-driven path for the span-sequence-equality contract
(BASELINE.json input_hint): ``with_fingerprint`` adds the per-row invariant
hash over (kind, text, media_ref, order).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from croawl_spark.functions.extract import extract_all, span_fingerprint

METADATA_OUT = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("dc_title", StringType()),
        StructField("dc_creator", ArrayType(StringType())),
        StructField("dc_identifier", StringType()),
        StructField("oai_endpoint", StringType()),
    ]
)


def _spans_to_dicts(raw) -> list[dict]:
    if raw is None:
        return []
    return [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
         "offset": s["offset"]}
        for s in raw
    ]


def extract_metadata(docs: DataFrame) -> DataFrame:
    """documents_interleaved(doc_id, spans, ...) -> metadata rows."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                ex = extract_all(_spans_to_dicts(spans))
                rows.append(
                    (doc_id, ex["dc_title"], ex["dc_creator"],
                     ex["dc_identifier"], ex["oai_endpoint"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in METADATA_OUT.fields])

    return docs.select("doc_id", "spans").mapInPandas(parse, METADATA_OUT)


def with_fingerprint(docs: DataFrame, col_name: str = "span_fp") -> DataFrame:
    """Append the span-sequence invariant fingerprint (V1)."""
    out_schema = docs.withColumn(col_name, F.lit("")).schema

    def fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[col_name] = pdf["spans"].map(
                lambda s: span_fingerprint(_spans_to_dicts(s))
            )
            yield pdf

    return docs.mapInPandas(fp, out_schema)
