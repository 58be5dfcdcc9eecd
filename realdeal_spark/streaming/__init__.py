from realdeal_spark.streaming.stream_apply import StreamingCdcApplier
from realdeal_spark.streaming.windows import session_rollup, tumbling_rollup

__all__ = ["StreamingCdcApplier", "session_rollup", "tumbling_rollup"]
