from realdeal_spark.streaming.stream_apply import StreamingCdcApplier
from realdeal_spark.streaming.windows import tumbling_rollup

__all__ = ["StreamingCdcApplier", "tumbling_rollup"]
