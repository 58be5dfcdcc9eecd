from realdeal_spark.streaming.cdf_source import (
    LakeChangesDataSource,
    foreach_changes,
    register_lake_changes,
    stream_changes,
    stream_maintain_dedup_index,
    stream_maintain_history,
    stream_maintain_ivf,
    stream_maintain_rollup,
)
from realdeal_spark.streaming.enrich import enrich_batch, stream_enrich
from realdeal_spark.streaming.stream_apply import StreamingCdcApplier
from realdeal_spark.streaming.suppress import suppress_unchanged
from realdeal_spark.streaming.windows import session_rollup, tumbling_rollup

__all__ = [
    "LakeChangesDataSource",
    "StreamingCdcApplier",
    "enrich_batch",
    "foreach_changes",
    "register_lake_changes",
    "session_rollup",
    "stream_changes",
    "stream_enrich",
    "stream_maintain_dedup_index",
    "stream_maintain_history",
    "stream_maintain_ivf",
    "stream_maintain_rollup",
    "suppress_unchanged",
    "tumbling_rollup",
]
