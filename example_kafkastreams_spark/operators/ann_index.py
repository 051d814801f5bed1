"""Persistent ANN index artifacts: build ONCE, query many times.

``pq_ann`` / ``ivf_pq_ann`` rebuild their index per call — right for
the oracle-checked driver rows, wrong for the production workflow
where a 100 TB corpus is encoded once and then served thousands of
queries. This module stores the two halves of an index the way
billion-vector deployments do (FAISS convention):

* the ENCODED CORPUS — parquet, (id, codes) for PQ or
  (id, cell, codes) for IVF-PQ: m bytes per vector instead of 4·dim
  floats, written by the same zero-shuffle map-side encode;
* the TRAINED PARAMETERS — ``meta.json`` beside it: kind, m,
  codebook (and centroids for IVF-PQ). Kilobytes; the artifact a
  query session loads driver-side to splice LUT literals.

Floats survive the JSON round trip exactly (``json`` serializes via
``float.__repr__``, the shortest exact representation), so a query
against the loaded index is bit-identical to one against the fresh
build — pinned by unit test.

Reference parity: the reference has no vector surface at all; this is
part of the §2.9 similarity-search extension
(``operators/knn.py`` docstrings carry the file:line citations).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .knn import (
    _empty_ann_result,
    ivf_pq_index,
    ivfpq_adc_score,
    pq_adc_score,
    pq_codebook,
    pq_encode,
)

_META = "meta.json"
_CODES = "codes"


def pq_index_write(
    emb: DataFrame,
    path: str,
    m: int = 8,
    num_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Encode ``emb`` with a PQ codebook and persist both halves under
    ``path``. The encode is the scan-shaped zero-shuffle pass of
    ``pq_encode``; the write is the only data movement."""
    codebook = pq_codebook(emb, m, num_codes, id_col, vec_col)
    pq_encode(emb, codebook, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, _CODES))
    with open(os.path.join(path, _META), "w") as f:
        json.dump(
            {
                "kind": "pq",
                "m": m,
                "num_codes": num_codes,
                "id_col": id_col,
                "codebook": codebook,
            },
            f,
        )


def ivfpq_index_write(
    emb: DataFrame,
    path: str,
    num_centroids: int = 8,
    m: int = 8,
    num_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ variant: (id, cell, codes) parquet + centroids and the
    residual codebook in the meta artifact."""
    enc, cents, codebook = ivf_pq_index(
        emb, num_centroids, m, num_codes, id_col, vec_col, persist=False
    )
    enc.write.mode("overwrite").parquet(os.path.join(path, _CODES))
    with open(os.path.join(path, _META), "w") as f:
        json.dump(
            {
                "kind": "ivfpq",
                "m": m,
                "num_codes": num_codes,
                "num_centroids": num_centroids,
                "id_col": id_col,
                "centroids": cents,
                "codebook": codebook,
            },
            f,
        )


def ann_index_read(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """(encoded corpus, meta dict). The codes frame is a plain parquet
    scan — filters (e.g. the probed-cell predicate) push down to it."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(path, _CODES)), meta


def ann_index_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for each row of ``queries`` (an (id, vector)
    frame, collected driver-side — the bounded small side, same
    convention as ``brute_force_knn``'s query broadcast) against the
    stored index, dispatching on the artifact's ``kind``.

    Scoring is the SAME code path as the fresh-build operators
    (``pq_adc_score`` / ``ivfpq_adc_score``), so a loaded index
    returns bit-identical results to an in-session build — only the
    encode cost disappears: queries against 100 TB touch the m-bytes/
    vector codes parquet (nprobe/num_centroids of it for IVF-PQ),
    never the raw vectors.
    """
    enc, meta = ann_index_read(spark, path)
    idc = id_col or meta["id_col"]
    qrows = queries.orderBy(idc).select(idc, vec_col).collect()
    if not qrows:
        return _empty_ann_result(enc.select(F.col(idc)), idc)
    if meta["kind"] == "pq":
        return pq_adc_score(enc, meta["codebook"], qrows, k, idc)
    if meta["kind"] == "ivfpq":
        return ivfpq_adc_score(
            enc, meta["centroids"], meta["codebook"], qrows, k, nprobe, idc
        )
    raise ValueError(f"unknown index kind {meta['kind']!r}")
