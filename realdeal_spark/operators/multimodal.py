"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns; everything that touches the
bytes runs as an Arrow-batched ``mapInPandas`` pass so the transfer is
columnar and the Python cost is per-batch, not per-row.  The actual
codec work (JPEG decode, resampling, frame sampling) needs libraries
this container doesn't ship — those steps are stubbed behind
``NotImplementedError`` with a deterministic fake used for tests, but
the Spark-side plumbing (schema, batch iteration, partition shape) is
the real production path.

The reference has no media handling; this implements the
training-data-pipeline mandate (driver instructions) with the same
engine rules as everything else: vectorized exchange, deterministic
outputs, no wall clock.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "{id} bigint, n_bytes int, width int, height int, format string"

_FORMATS = ["img", "audio", "video"]


def decode_image(payload: bytes) -> "object":
    """Real decode would return an ndarray; no imaging libs here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this container; "
        "use fake_meta() for the deterministic test path"
    )


def fake_meta(payload: bytes) -> dict:
    """Deterministic fake 'decode': metadata derived purely from the
    byte length, so the DuckDB oracle can replicate it exactly."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 16,
        "height": n % 480 + 16,
        "format": _FORMATS[n % 3],
    }


def binary_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """payload binary → typed metadata row per input row.

    mapInPandas keeps the batch shape: one pandas DataFrame per Arrow
    batch, bytes never round-trip through per-row Python objects in
    the driver.  At 100 TB this is the pattern for any media
    feature-extraction stage — partition by storage locality, decode
    per batch, emit narrow typed columns.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "width": (n % 640 + 16).astype("int32"),
                    "height": (n % 480 + 16).astype("int32"),
                    "format": (n % 3).map(lambda i: _FORMATS[i]),
                }
            )

    return df.mapInPandas(gen, schema=META_SCHEMA.format(id=id_col))


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 30,
) -> DataFrame:
    """Frame-sampling stub: the real implementation would mapInPandas
    over video payloads and explode sampled frames; decode is not
    available in this container."""
    raise NotImplementedError(
        "video frame sampling requires a codec library; the mapInPandas "
        "shape is identical to binary_meta()"
    )
