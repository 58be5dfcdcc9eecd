"""Source/sink connectors (S1/S2/S7/S8) and multimodal binary plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realdeal_spark.operators.multimodal import binary_meta, decode_image, fake_meta
from realdeal_spark.sources import (
    read_json_batch,
    write_csv,
    write_json_batch,
    write_partitioned_csv,
)

SCHEMA = "id bigint, city string, price double"
ROWS = [(1, "sf", 1.5), (2, "oakland", 2.5), (3, "sf", 3.5)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j")
    # coalesce(1): several objects land in ONE file, so the JSONL read
    # mode is actually exercised (multiLine would read 1 object/file)
    write_json_batch(_df(spark).coalesce(1), p)
    back = read_json_batch(spark, p, SCHEMA, multi_line=False)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_json_array_file_scan(spark, tmp_path):
    """The reference's exact file shape: one JSON array per file."""
    p = tmp_path / "arr.json"
    p.write_text('[{"id": 7, "city": "sj", "price": 9.0},\n'
                 '{"id": 8, "city": "sj", "price": 10.0}]')
    back = read_json_batch(spark, str(p), SCHEMA)
    assert back.count() == 2
    assert {r["id"] for r in back.collect()} == {7, 8}


def test_polygon_csv_scan(spark, tmp_path):
    """S15: KML-style coordinate strings parse JVM-side into
    xs/ys double arrays ready for point_in_polygon_join."""
    from realdeal_spark.sources.io import read_polygon_csv

    p = tmp_path / "polys.csv"
    p.write_text(
        "poly_id,coordinates\n"
        'sq,"0.0,0.0 1.0,0.0 1.0,1.0 0.0,1.0"\n'
        'tri,"2.0,0.0 3.0,0.0 2.5,1.0"\n'
    )
    out = {r["poly_id"]: r for r in read_polygon_csv(spark, str(p)).collect()}
    assert out["sq"]["xs"] == [0.0, 1.0, 1.0, 0.0]
    assert out["sq"]["ys"] == [0.0, 0.0, 1.0, 1.0]
    assert out["tri"]["xs"] == [2.0, 3.0, 2.5]
    # parsed polygons feed the J6 join directly
    from realdeal_spark.operators.geo import point_in_polygon_join

    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.5, 0.4)], "id bigint, lon double, lat double"
    )
    polys = read_polygon_csv(spark, str(p))
    got = {
        (r["id"], r["poly_id"])
        for r in point_in_polygon_join(pts, polys).select("id", "poly_id").collect()
    }
    assert got == {(1, "sq"), (2, "tri")}


def test_csv_sink_header_and_field_order(spark, tmp_path):
    p = str(tmp_path / "c")
    write_csv(_df(spark), p, fieldnames=["city", "id"])
    files = [f for f in os.listdir(p) if f.endswith(".csv")]
    header = open(os.path.join(p, files[0])).readline().strip()
    assert header == "city,id"


def test_partitioned_csv_sink(spark, tmp_path):
    p = str(tmp_path / "pc")
    write_partitioned_csv(_df(spark), p, "city")
    dirs = {d for d in os.listdir(p) if d.startswith("city=")}
    assert dirs == {"city=sf", "city=oakland"}
    # union-all read of the same directory (the reference's extra file)
    back = spark.read.option("header", True).csv(p)
    assert back.count() == 3


def test_binary_meta_matches_fake_decode(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"x" * 700)], "doc_id bigint, payload binary"
    )
    out = {r["doc_id"]: r.asDict() for r in binary_meta(df).collect()}
    for i, payload in [(1, b"abc"), (2, b"x" * 700)]:
        expect = fake_meta(payload)
        got = out[i]
        assert got["n_bytes"] == expect["n_bytes"]
        assert got["width"] == expect["width"]
        assert got["height"] == expect["height"]
        assert got["format"] == expect["format"]


def test_real_decode_probes_pil():
    """decode_image is a pip-probe: real decode when PIL is present,
    NotImplementedError fallback otherwise (this container: absent)."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 3), (10, 20, 30)).save(buf, format="PNG")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (3, 2, 3)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8")


def test_sample_frames_plumbing(spark):
    """The mapInPandas frame-sampling shape with the deterministic
    extractor: fixed 256-byte pseudo-frames, every 2nd kept."""
    from realdeal_spark.operators.multimodal import fake_frames, sample_frames

    df = spark.createDataFrame(
        [(1, b"a" * 700), (2, b"b" * 100)], "doc_id bigint, payload binary"
    )
    out = sample_frames(df, every_n=2).collect()
    rows = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in out}
    # 700 bytes → frames [0:256][256:512][512:700]; every 2nd → idx 0, 2
    assert set(rows) == {(1, 0), (1, 2), (2, 0)}
    assert rows[(1, 0)] == b"a" * 256
    assert rows[(1, 2)] == b"a" * (700 - 512)
    assert rows[(2, 0)] == b"b" * 100
    assert fake_frames(b"x" * 300) == [b"x" * 256, b"x" * 44]


def test_multimodal_string_ids(spark):
    """Non-bigint doc ids must flow through both mapInPandas passes —
    the output id type is derived from the input schema."""
    from realdeal_spark.operators.multimodal import binary_meta, sample_frames

    df = spark.createDataFrame(
        [("doc-a", bytearray(b"x" * 600)), ("doc-b", bytearray(b"y" * 100))],
        "doc_id string, payload binary",
    )
    meta = {r["doc_id"]: r["n_bytes"] for r in binary_meta(df).collect()}
    assert meta == {"doc-a": 600, "doc-b": 100}
    frames = sample_frames(df, every_n=1, extractor=None).collect()
    assert {r["doc_id"] for r in frames} == {"doc-a", "doc-b"}
    assert all(isinstance(r["doc_id"], str) for r in frames)
