from realdeal_spark.functions import scalars  # noqa: F401

__all__ = ["scalars"]
