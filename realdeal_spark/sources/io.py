"""Batch source/sink connectors (SURVEY §2.1).

The reference moves every stage boundary through JSON-array files
(``"[%s]" % ",\\n".join(json.dumps(p) ...)`` at
realdeal/luigi/find_new_properties.py:51-52 and 7 more sites) and
reports through header-first CSVs (realdeal/luigi/write_csv.py:19-24)
including a one-file-per-region partitioned variant
(realdeal/luigi/scrape_redfin.py:47-57).  Here each is the built-in
DataFrame reader/writer with an explicit schema — schema-on-read
replaces the reference's schema-on-write dict discipline.

Scheme dispatch (s3 vs local, realdeal/luigi/target_factory.py:20-40)
is free: Spark's Hadoop FS layer resolves ``s3a://`` / ``file://`` /
``hdfs://`` from the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_batch(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    multi_line: bool = True,
) -> DataFrame:
    """JSON batch scan with explicit schema (S1).

    ``multi_line=True`` accepts the reference's JSON-*array* file
    shape (one array per file); pass ``False`` for JSONL (one object
    per line — the splittable shape write_json_batch emits; multiLine
    would swallow all but the first object per file).
    An explicit schema is required: schema inference is a full extra
    pass over the data — never acceptable at scale.
    """
    reader = spark.read.schema(schema)
    if multi_line:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def write_json_batch(df: DataFrame, path: str, mode: str = "error") -> None:
    """JSONL sink (S2). One object per line — the scale-correct
    re-expression of the reference's single JSON array (an array
    forces whole-file buffering; lines stream and split)."""
    df.write.mode(mode).json(path)


def read_polygon_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV boundary-polygon scan (S15).

    The reference loads zip-code boundary polygons from a CSV whose
    geometry column is a KML-ish coordinate string
    (scrape_craigslist_rentals.ipynb cell 0, ``ZipGeoCoder.__init__``:
    per-row ``"lon,lat lon,lat ..."`` parsed with shapely).  Here the
    scan is a header CSV with columns ``(poly_id, coordinates)`` and
    the geometry parse is pure Catalyst — ``split`` + ``transform`` +
    decimal-string→double cast, JVM-side, no Python in the path —
    yielding ``(poly_id, xs array<double>, ys array<double>)`` ready
    for :func:`operators.geo.point_in_polygon_join`.
    """
    raw = spark.read.option("header", "true").schema(
        "poly_id string, coordinates string"
    ).csv(path)
    pairs = F.split(F.col("coordinates"), " ")
    return raw.select(
        "poly_id",
        F.transform(
            pairs, lambda p: F.split(p, ",").getItem(0).cast("double")
        ).alias("xs"),
        F.transform(
            pairs, lambda p: F.split(p, ",").getItem(1).cast("double")
        ).alias("ys"),
    )


def write_csv(
    df: DataFrame,
    path: str,
    fieldnames: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Header CSV sink with fixed column order (S7: write_csv.py's
    ``csv.DictWriter(fieldnames=...)``)."""
    out = df.select(*fieldnames) if fieldnames else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_partitioned_csv(
    df: DataFrame,
    path: str,
    partition_col: str,
    fieldnames: list[str] | None = None,
    mode: str = "error",
) -> None:
    """One directory per partition value (S8: per-region
    ``sales_records_%d.csv``).  ``partitionBy`` prunes on read and
    parallelizes on write; the reference's extra union-all file is the
    unpartitioned read of the same directory."""
    cols = fieldnames if fieldnames else [c for c in df.columns if c != partition_col]
    df.select(partition_col, *cols).write.mode(mode).partitionBy(
        partition_col
    ).option("header", "true").csv(path)
