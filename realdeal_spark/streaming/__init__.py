from realdeal_spark.streaming.stream_apply import StreamingCdcApplier
from realdeal_spark.streaming.suppress import suppress_unchanged
from realdeal_spark.streaming.windows import session_rollup, tumbling_rollup

__all__ = [
    "StreamingCdcApplier",
    "session_rollup",
    "suppress_unchanged",
    "tumbling_rollup",
]
