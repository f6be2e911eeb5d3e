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

from croawl_spark.functions.extract import extract_from_html, span_fingerprint

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


def _html_expr(spans_col: str = "spans") -> F.Column:
    """The doc_text() contract as pure JVM array functions: text spans
    (kind == 'text', text not null), concatenated in offset order with
    original array position as the stable tiebreak (python ``sorted`` is
    stable). struct natural ordering sorts (offset, idx) lexicographically,
    so ``array_sort`` needs no comparator. One flat string per doc crosses
    the Arrow boundary instead of the nested span structs (guide §4: pass
    only the columns the function needs — measured ~40% of the extract
    stage was struct shipping + per-row dict conversion)."""
    spans = F.coalesce(F.col(spans_col), F.array())
    n = F.size(spans)
    idxd = F.when(
        n >= 1,
        F.array_sort(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    F.element_at(spans, i)["offset"].alias("o"),
                    i.alias("i"),
                    F.element_at(spans, i)["kind"].alias("k"),
                    F.element_at(spans, i)["text"].alias("t"),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<o:int,i:int,k:string,t:string>>"))
    texts = F.filter(
        idxd, lambda s: (s["k"] == F.lit("text")) & s["t"].isNotNull()
    )
    return F.array_join(F.transform(texts, lambda s: s["t"]), "")


def extract_metadata(docs: DataFrame) -> DataFrame:
    """documents_interleaved(doc_id, spans, ...) -> metadata rows.

    The HTML string is assembled JVM-side (``_html_expr``); the Python
    stage parses one flat string per row (extract_from_html — the same
    single source of truth the fixtures pin via extract_all)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["_html"]):
                ex = extract_from_html(html)
                rows.append(
                    (doc_id, ex["dc_title"], ex["dc_creator"],
                     ex["dc_identifier"], ex["oai_endpoint"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in METADATA_OUT.fields])

    return docs.select(
        "doc_id", _html_expr("spans").alias("_html")
    ).mapInPandas(parse, METADATA_OUT)


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
