"""Scale guards for declared-exact (all-pairs) oracles.

``dedup_embedding_pairs`` and ``ann_topk_bruteforce`` are ground-truth
oracles: intentionally O(n^2)/O(n*q) so the banded/IVF scale paths have
something exact to be measured against.  Their docstrings have always
said "run on samples"; this module makes the code enforce it.  The guard
is a single count() of the input -- a column-pruned metadata-cheap scan,
negligible next to the quadratic join it protects -- and a loud
ValueError beats six hours of a 100 TB cross join nobody meant to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# All-pairs on 50k unit vectors is ~1.25e9 dot products: expensive but
# tractable ground-truth territory.  Beyond that you are no longer
# "running on a sample" and the guard refuses.
EXACT_PAIRS_MAX_ROWS = 50_000


def ensure_sample_scale(
    df: DataFrame, *, cap: int = EXACT_PAIRS_MAX_ROWS, operator: str
) -> DataFrame:
    """Refuse to build an all-pairs plan over more than ``cap`` rows.

    Returns ``df`` unchanged when within budget so call sites stay
    expression-shaped.  Counting here is eager by design: the guard must
    fire at plan-build time, before any quadratic stage is scheduled.
    """
    n = df.count()
    if n > cap:
        raise ValueError(
            f"{operator} is a declared-exact all-pairs oracle; input has "
            f"{n:,} rows which exceeds its sample cap of {cap:,}. Point it "
            "at a sample (df.sample/limit) or use the scale path "
            "(MinHash/SimHash banding, IVF/LSH ANN) for full-corpus runs."
        )
    return df
