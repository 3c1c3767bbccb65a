"""Coarse-partition grouped execution.

``ds.groupby(keys).map_groups(fn)`` pays one Ray-level Python call per
GROUP — ruinous when groups are numerous and small (per-token vocab merges,
per-user windows, per-surface canonicalization: the common case at corpus
scale).  ``partitioned_map_groups`` keeps the exact same per-group semantics
but shuffles ONCE on a coarse deterministic hash of the key (a key's group
never splits across partitions) and iterates the real groups locally in
pandas inside each partition, which is orders of magnitude cheaper per
group.  ``num_parts`` bounds per-reducer memory: raise it for bigger data,
exactly like choosing the number of reducers.

The partition hash is ``pd.util.hash_pandas_object`` with its fixed default
key — deterministic across processes and nodes (builtin ``hash`` is NOT).
"""

from __future__ import annotations

import pandas as pd

_PART_COL = "__part"


def partitioned_map_groups(ds, keys, fn, num_parts: int = 64):
    """Semantics of ``ds.groupby(keys).map_groups(fn, batch_format="pandas")``
    with one coarse hash shuffle instead of per-group task dispatch.

    ``fn`` receives each group as a DataFrame (grouping columns included,
    like map_groups) and returns a DataFrame.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False)
        df = df.copy()
        df[_PART_COL] = (h % num_parts).astype("int32")
        return df

    def _apply(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=[_PART_COL])
        out = [fn(g) for _, g in part.groupby(keys, sort=True)]
        out = [o for o in out if o is not None and len(o)]
        if not out:
            # every group produced nothing: emit a 0-row frame with fn's
            # output schema when fn tolerates empty input, else nothing
            try:
                return fn(part.iloc[0:0])
            except Exception:  # noqa: BLE001
                return pd.DataFrame()
        return pd.concat(out, ignore_index=True)

    return (
        ds.map_batches(_tag, batch_format="pandas")
        .groupby(_PART_COL)
        .map_groups(_apply, batch_format="pandas")
    )


def partitioned_apply(ds, keys, fn, num_parts: int = 64):
    """Hash-partition on ``keys`` and call ``fn`` ONCE per partition with the
    whole partition frame (all groups of a key land in one partition, like
    :func:`partitioned_map_groups`, but with NO per-group Python dispatch at
    all — ``fn`` must be vectorized across groups, e.g. groupby-aggregate /
    sort + drop_duplicates).  This is the right tool when per-group work is
    itself expressible as frame ops: ``partitioned_map_groups`` still pays
    ~ms of pandas slicing per group, which dominates once groups number in
    the tens of thousands (observed: canonicalization finalize 30 s -> 3 s
    on 17k surface groups)."""
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False)
        df = df.copy()
        df[_PART_COL] = (h % num_parts).astype("int32")
        return df

    def _apply(part: pd.DataFrame) -> pd.DataFrame:
        return fn(part.drop(columns=[_PART_COL]))

    return (
        ds.map_batches(_tag, batch_format="pandas")
        .groupby(_PART_COL)
        .map_groups(_apply, batch_format="pandas")
    )
