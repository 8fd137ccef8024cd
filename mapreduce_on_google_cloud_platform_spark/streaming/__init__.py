from .incremental import PURCHASE_SNAPSHOT_ORACLE, purchase_snapshot_latest
from .windows import STREAMING_QUERIES as _WINDOW_QUERIES

STREAMING_QUERIES = _WINDOW_QUERIES + [
    ("purchase_snapshot_latest", purchase_snapshot_latest, PURCHASE_SNAPSHOT_ORACLE),
]

__all__ = ["STREAMING_QUERIES"]
