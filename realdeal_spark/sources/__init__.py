from realdeal_spark.sources.io import (
    read_json_batch,
    write_csv,
    write_json_batch,
    write_partitioned_csv,
)

__all__ = [
    "read_json_batch",
    "write_json_batch",
    "write_csv",
    "write_partitioned_csv",
]
