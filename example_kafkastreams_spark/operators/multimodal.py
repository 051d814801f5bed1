"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature-extract plumbing.

North-star extension (SURVEY.md §2.9). Media bytes travel as a
``binary`` column next to a typed metadata struct; decode /
feature-extraction runs in ``mapInPandas`` so bytes cross to Python
once per Arrow batch, never per row. The image/audio libraries are not
available in this environment, so the actual codec step is STUBBED:

- ``decode_image_batches`` (default) — a deterministic fake that
  REALLY consumes the payload bytes (length + byte-sum checksum) so
  the Spark-side plumbing (binary column → Arrow → pandas → struct
  result schema) is exercised and oracle-checkable end to end.
- ``decode_image_batches_real`` — the real path, gated behind an
  import-try; raises ``NotImplementedError`` here by design.

Scale notes: payload columns dominate row width, so every query
selects them LAST and only when decoding (column pruning keeps scans
payload-free otherwise); decode parallelism = partition count, state
none; the Arrow batch size bounds Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..shipping import ensure_package_shipped

# Result schema of the (fake) image decode: plumbing-real, codec-fake.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def attach_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model a media table: (id, payload: binary, meta: struct).

    The testdata has no binary table, so the document text doubles as
    the payload bytes (UTF-8). The schema/partitioning shape is what a
    real image table looks like: id + opaque bytes + typed metadata.
    """
    return docs.select(
        F.col(id_col),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(text_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(doc_id: int, mime: str, payload: bytes) -> dict:
    n = len(payload)
    return {
        "doc_id": doc_id,
        "mime": mime,
        "n_bytes": n,
        # Proof the bytes actually reached Python: a content checksum.
        "byte_sum": sum(payload),
        # Deterministic fake dimensions/frames derived from length.
        "width": 64 + n % 577,
        "height": 64 + (n * 31) % 577,
        "n_frames": 1 + n % 7,
    }


def decode_image_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas decode kernel (deterministic fake codec)."""
    for pdf in it:
        yield pd.DataFrame.from_records(
            [
                _fake_decode(r.doc_id, r.meta["mime"], bytes(r.payload))
                for r in pdf.itertuples(index=False)
            ],
            columns=[f.name for f in DECODED_SCHEMA.fields],
        )


def decode_image_batches_real(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real codec path — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "real image decode needs PIL; use decode_image_batches (fake)"
        ) from e
    raise NotImplementedError("real decode not implemented in this build")


def decode_images(media: DataFrame) -> DataFrame:
    """Run the decode kernel over a payload table."""
    ensure_package_shipped(media.sparkSession)
    return media.mapInPandas(decode_image_batches, schema=DECODED_SCHEMA)


# --- frame sampling (video-style 1 → N expansion) -------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frame_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with 1→N output shape: each payload emits one
    row per sampled "frame" (fixed stride over the byte stream; the
    checksum proves each frame's bytes were read). The real video
    decoder drops in here; the Spark-side contract — expansion inside
    the Arrow batch, no explode of a materialized array — is the part
    that matters at scale (frames never exist as a driver- or
    row-level collection)."""
    stride = 256
    for pdf in it:
        recs = []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload)
            for idx, off in enumerate(range(0, len(payload), stride)):
                chunk = payload[off : off + stride]
                recs.append(
                    {
                        "doc_id": r.doc_id,
                        "frame_idx": idx,
                        "frame_offset_bytes": off,
                        "frame_checksum": sum(chunk),
                    }
                )
        yield pd.DataFrame.from_records(
            recs, columns=[f.name for f in FRAME_SCHEMA.fields]
        )


def sample_frames(media: DataFrame) -> DataFrame:
    ensure_package_shipped(media.sparkSession)
    return media.mapInPandas(sample_frame_batches, schema=FRAME_SCHEMA)
