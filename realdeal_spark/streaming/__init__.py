from realdeal_spark.streaming.stream_apply import StreamingCdcApplier

__all__ = ["StreamingCdcApplier"]
