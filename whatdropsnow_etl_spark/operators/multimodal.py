"""Multimodal columns: opaque binary payloads + typed metadata.

Reference parity: the engine treats media as opaque attribute blobs
(SURVEY §2.3 multimodal row); here images/audio/video are a
``binary`` column plus a metadata struct, processed with
``mapInPandas`` — the Arrow-batched slow-path escape hatch the rest
of this package deliberately avoids. The Spark-side plumbing
(schema, batch iteration, partition-parallel execution) is real and
tested; the pixel/sample decode itself is stubbed because no media
libraries ship in this environment (``decoder="pil"`` raises
NotImplementedError until Pillow is installed; the default
deterministic feature extractor exercises the full data path and
has an exact SQL twin).

Scale: mapInPandas streams Arrow batches executor-side — state is
one batch (~10k rows), not one partition, so 100 TB of media flows
through without materializing partitions in Python memory. Payload
bytes never shuffle: extraction is a narrow map; only the small
feature rows move on.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, payload_md5 string,"
    " fake_width bigint, fake_height bigint"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive an opaque binary payload column + typed metadata.

    Stands in for reading real media blobs: payload bytes are the
    UTF-8 encoding of the text (deterministic, content-addressed),
    metadata is a struct the way an image table would carry
    (format, n_bytes). Fully JVM-side.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: pretend dimensions
    derived from byte length (SQL-twin-able)."""
    n = len(payload)
    return 64 + n % 512, 64 + (n * 7) % 512


def _pil_decode(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed; "
            "use decoder='fake' for the deterministic stand-in"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height


_DECODERS = {"fake": _fake_decode, "pil": _pil_decode}


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    Input: (doc_id, payload binary, meta struct). Output one feature
    row per payload: byte count, content md5, decoded dimensions.
    The decode callable runs per-row inside an Arrow batch — the
    batch loop, not the row loop, crosses the JVM/Python boundary.
    """
    decode = _DECODERS[decoder]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415

        for batch in it:
            payloads = batch["payload"]
            dims = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """attach_binary_payload ∘ extract_features, the end-to-end
    multimodal pipeline over a text-backed corpus."""
    return extract_features(attach_binary_payload(df, text_col, id_col))
