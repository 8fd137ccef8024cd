"""Pin the batch Space-Saving audit constants to the streaming monitor's.

ADVICE r9 (low): ``operators/text_analysis.py`` duplicates
``streaming/stateful.py``'s SS_SHARDS/SS_CAPACITY by hand (the batch
module deliberately avoids importing the streaming package), so a drift
in the streaming constants would make ``heavy_hitter_shard_plan`` silently
audit a DIFFERENT sketch configuration than the monitor it tunes.  The
import is fine inside a test; equality here is the contract.
"""

from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
    SS_AUDIT_CAPACITY,
    SS_AUDIT_SHARDS,
)
from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
    SS_CAPACITY,
    SS_SHARDS,
)


def test_space_saving_audit_constants_match_streaming_monitor():
    assert SS_AUDIT_SHARDS == SS_SHARDS
    assert SS_AUDIT_CAPACITY == SS_CAPACITY
