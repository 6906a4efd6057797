"""Partial (combiner-style) grouped aggregation.

``groupby(key).aggregate(...)`` is an all-to-all sort shuffle — for
modest result cardinalities that is pure overhead (the guide's
"pre-aggregate first" rule). ``partial_grouped_agg`` computes partial
aggregates per batch inside ``map_batches`` (rows out ≈ distinct keys
per batch), coalesces the small partial stream to one block, and
combines. At 100 TB the same two stages stay valid — the combine step
becomes a ``groupby`` over partials when distinct keys no longer fit a
block (swap ``repartition(1)`` for ``groupby(keys)``), which is exactly
the mergeable-sketch layout.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd


def partial_grouped_agg(
    ds,
    build_partial: Callable[[pd.DataFrame], pd.DataFrame],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
) -> pd.DataFrame:
    """build_partial: batch → partial aggregate rows (per-batch groupby);
    combine: all partial rows → final aggregate rows."""
    parts = ds.map_batches(build_partial, batch_format="pandas")
    out = parts.repartition(1).map_batches(
        combine, batch_format="pandas", batch_size=None
    )
    return out.to_pandas()


def sum_count_partial(keys: list[str], sums: list[str]):
    """Standard partial: per-key COUNT + SUM columns. Returns
    (build_partial, make_combine) where the final combine re-sums."""

    def build(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False, sort=False).agg(
            _n=(keys[0], "size"), **{c: (c, "sum") for c in sums}
        )
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(
            _n=("_n", "sum"), **{c: (c, "sum") for c in sums}
        )

    return build, combine
