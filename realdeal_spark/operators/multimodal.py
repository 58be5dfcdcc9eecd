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

META_SCHEMA = "{id} {id_type}, n_bytes int, width int, height int, format string"

_FORMATS = ["img", "audio", "video"]


def decode_image(payload: bytes) -> "object":
    """Decode image bytes to an HxWx3 uint8 ndarray.

    Pip-probe: uses PIL when the environment ships it (so the stub is
    the *fallback*, not the only path); raises ``NotImplementedError``
    otherwise — this container has no imaging libs, so tests exercise
    the probe-and-fallback branch plus :func:`fake_meta`.
    """
    try:
        from io import BytesIO

        import numpy as np
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "image decode requires PIL (pip install pillow), not available "
            "in this container; use fake_meta() for the deterministic "
            "test path"
        ) from None
    with Image.open(BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


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

    # id type follows the input schema (string doc ids fail Arrow
    # conversion under a hardcoded bigint — same class of bug as the
    # dedup Arrow path's id handling)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(gen, schema=META_SCHEMA.format(id=id_col, id_type=id_type))


def fake_frames(payload: bytes, frame_bytes: int = 256) -> list[bytes]:
    """Deterministic fake frame extractor: fixed-stride byte slices.
    Stands in for a codec-backed extractor (pyav/opencv) that this
    container can't ship; same output contract (list of frame blobs)."""
    return [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)]


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 30,
    extractor=None,
) -> DataFrame:
    """Every-n-th frame per video payload, exploded to one row each.

    The Spark-side plumbing is the real production path: Arrow-batched
    ``mapInPandas``, rows exploded per payload, narrow typed output
    ``(id, frame_idx, frame binary)`` that downstream decode/resize
    stages consume batch-wise.  Only the *codec* is pluggable:
    ``extractor(payload) -> list[bytes]`` defaults to the
    deterministic :func:`fake_frames` (no codec libs in this
    container); production passes a pyav/opencv-backed extractor with
    the identical contract.
    """
    ex = extractor or fake_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                fr = ex(bytes(payload))
                for k in range(0, len(fr), every_n):
                    ids.append(_id)
                    idxs.append(k)
                    frames.append(fr[k])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        gen, schema=f"{id_col} {id_type}, frame_idx int, frame binary"
    )
