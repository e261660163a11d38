"""Reusable window / temporal-join operators Ray Data lacks natively.

Ray Data has no window functions, no as-of join and no interval join;
the reference computes all of these in per-book Python loops (e.g.
``lore/events.py:433-500`` walks sorted event lists to attach "previous
event" context).  These are the library forms of the three
custom-operator families (VERDICT r4 #3) — each is a composition of the
bucketed hashagg exchange + a vectorized per-partition kernel, so the
partitioning assumption is explicit and identical for all three: ALL
rows of one partition key fit in one hashagg bucket (keys are
entity-/vocabulary-shaped, never corpus-shaped).

* :func:`windowed_lag`   — per-partition LAG over a total order (the
  distributed as-of / point-in-time lookup: hash-partition on the
  equality key, per-group sort, vectorized shift).
* :func:`range_join`     — interval-overlap self-join by discretizing
  the range domain (explode each [lo, hi] to its integer points, emit
  pairs inside point-bucketed groups — group sizes bounded by the
  per-key vocabulary — then merge per-pair hits).
* :func:`windowed_count` — value-range windowed aggregate (COUNT over a
  trailing ``RANGE BETWEEN k PRECEDING AND CURRENT ROW`` frame): per-
  partition sort + two searchsorted cursors, O(n log n), no pairwise
  expansion.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

import ray.data as rd


def _nparts(frac: float = 1.0) -> int:
    from raykg.pipelines.kg import _ncpu
    return max(8, int(_ncpu() * frac))


def windowed_lag(ds: rd.Dataset, by: Sequence[str], order: Sequence[str],
                 value_cols: Mapping[str, object],
                 prefix: str = "prev_",
                 num_partitions: int | None = None) -> rd.Dataset:
    """Distributed LAG(1): for each row, attach the same-partition row
    immediately preceding it in ``order`` — the as-of (point-in-time)
    lookup pattern.  ``value_cols`` maps each lagged column to its
    sentinel fill (sentinels, not NULLs, keep result hashes
    engine-stable).  Rows tying on the full ``by + order`` key are
    identical on it, so swapping them permutes identical outputs — the
    result multiset is deterministic.

    Partitioning: one hash exchange on ``by``; each partition sorts only
    its own rows (mergesort — stable) and shifts vectorized.
    """
    from raykg.functions import hashagg

    by = list(by)
    order = list(order)
    fills = dict(value_cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by + order, kind="mergesort")
        grp = g.groupby(by, sort=False)
        assign = {}
        for col, fill in fills.items():
            shifted = grp[col].shift(1)
            if pd.api.types.is_integer_dtype(g[col].dtype):
                assign[prefix + col] = shifted.fillna(fill).astype(
                    g[col].dtype)
            else:
                assign[prefix + col] = shifted.fillna(fill)
        return g.assign(**assign)

    return hashagg.grouped_apply(
        ds, by, per_bucket,
        coalesce=num_partitions or _nparts(0.5))


def range_join(ds: rd.Dataset, by: Sequence[str], lo: str, hi: str,
               id_col: str,
               num_partitions: int | None = None) -> rd.Dataset:
    """Interval-overlap SELF-join over integer ranges: every ``id`` pair
    (id_a < id_b) within the same ``by`` group whose closed ranges
    [lo, hi] intersect, with ``n_overlap`` (shared integer points) and
    ``first_overlap`` (smallest shared point).  Rows with lo > hi are
    empty ranges and join nothing.

    Ray-Data-first by DISCRETIZING the range domain (the classic
    interval-join-by-bucketing): each row explodes to its integer
    points (vectorized repeat — domains are era-/grid-shaped, a handful
    of points per row), pairs are emitted inside (by, point)-bucketed
    groups — group sizes bounded by the per-key vocabulary, never the
    corpus — and a second bucketed aggregation merges per-point pair
    hits.  For wide numeric ranges, rescale to a coarse grid first; the
    pair-merge stays exact because overlap stats count exploded points.
    """
    from raykg.functions import hashagg

    by = list(by)
    nparts = num_partitions or _nparts(0.5)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lo_v = df[lo].to_numpy().astype("int64")
        hi_v = df[hi].to_numpy().astype("int64")
        width = np.maximum(hi_v - lo_v + 1, 0)
        idx = np.repeat(np.arange(len(df)), width)
        # point = lo + offset-within-row (vectorized ranges concat)
        csum = np.concatenate([[0], np.cumsum(width)])[:-1]
        point = lo_v[idx] + (np.arange(width.sum()) - csum[idx])
        out = df.iloc[idx][by + [id_col]].reset_index(drop=True)
        out["point"] = pd.Series(point, dtype="int64")
        return out

    points = ds.map_batches(explode, batch_format="pandas")

    def pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g.merge(g, on=by + ["point"], suffixes=("_a", "_b"))
        out = out[out[f"{id_col}_a"] < out[f"{id_col}_b"]]
        return out.rename(columns={f"{id_col}_a": "id_a",
                                   f"{id_col}_b": "id_b"})[
            by + ["id_a", "id_b", "point"]]

    per_point = hashagg.grouped_apply(points, by + ["point"], pairs_group,
                                      coalesce=nparts)

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(by + ["id_a", "id_b"], sort=False)
                .agg(n_overlap=("point", "size"),
                     first_overlap=("point", "min"))
                .reset_index())

    return hashagg.grouped_apply(per_point, by + ["id_a", "id_b"],
                                 merge_pairs, coalesce=nparts)


def windowed_count(ds: rd.Dataset, by: Sequence[str], order: str,
                   range_: int, name: str = "n_window",
                   num_partitions: int | None = None) -> rd.Dataset:
    """Value-range windowed COUNT: per row, the number of same-partition
    rows whose ``order`` value falls in the trailing closed window
    ``[row.order − range_, row.order]`` — SQL's ``COUNT(*) OVER
    (PARTITION BY by ORDER BY order RANGE BETWEEN range_ PRECEDING AND
    CURRENT ROW)``.  RANGE-frame semantics: all rows tying on ``order``
    share one count, so no tiebreak is needed and the result is
    order-independent by construction.

    One hash exchange on ``by``, per-partition sort, then two
    ``searchsorted`` cursors per group — O(n log n) per partition, no
    pairwise expansion.
    """
    from raykg.functions import hashagg

    by = list(by)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by + [order], kind="mergesort").reset_index(
            drop=True)
        counts = np.empty(len(g), dtype="int64")
        vals = g[order].to_numpy()
        for _, idx in g.groupby(by, sort=False).indices.items():
            v = vals[idx]                       # sorted within group
            lo = np.searchsorted(v, v - range_, side="left")
            hi = np.searchsorted(v, v, side="right")
            counts[idx] = hi - lo
        return g.assign(**{name: counts})

    return hashagg.grouped_apply(
        ds, by, per_bucket, coalesce=num_partitions or _nparts(0.5))
