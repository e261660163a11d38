"""Events branch: pattern event extraction → dedup → temporal ordering.

Transposed reference semantics:

* pattern event extraction — ``lore/events.py:621-646`` (M17): done in the
  unit extractor (kind='event' rows carry agent/action/patient + era/year
  from the temporal regex, ``lore/temporal.py:294-346``).
* event dedup (R6)         — ``lore/events.py:381-395``: normalized key =
  lower(agent) | action stripped of trailing ed/s | patient minus leading
  article; exact dedup via groupby(key); the surviving row is the one with
  the minimum unit_id (order-independent analog of "first occurrence wins").
* temporal ordering (R8)   — ``lore/events.py:433-500``: sort by
  (era order, year, key); ADJACENT pairs → ``before`` edges, conf 0.95
  across eras / 0.90 across years within an era; equal (era, year) → no
  edge.

``adjacent_pairs`` solves the sorted-Dataset window problem (SURVEY.md
§7.4): in-block adjacent pairs are emitted per batch, and each block's
first/last rows (2 per block, tiny) are collected to stitch cross-block
pairs on the driver.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd

from raykg import vocab
from raykg.functions.textnorm import strip_article

ACTION_NORM_PATTERN = r"(ed|s)$"
_ACTION_RE = re.compile(ACTION_NORM_PATTERN)


def event_key(agent: str, action: str, patient: str) -> str:
    """R6 normalized dedup key (events.py:381-395 analog)."""
    return "|".join([agent.lower(),
                     _ACTION_RE.sub("", action.lower()),
                     strip_article(patient.lower())])


def dedup_events(events_ds: rd.Dataset) -> rd.Dataset:
    """groupby(event_key) → keep min-unit_id row (order-independent)."""

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["event_key"] = [event_key(a, v, p) for a, v, p in
                           zip(df["subj"], df["pred"], df["obj"])]
        return df

    from raykg.functions import hashagg
    return hashagg.first_by(events_ds.map_batches(add_key,
                                                  batch_format="pandas"),
                            ["event_key"], ["unit_id"])


def adjacent_pairs(sorted_ds: rd.Dataset, cols: list[str]
                   ) -> list[tuple[dict, dict]]:
    """Adjacent row pairs of an already-sorted Dataset.

    Emits in-block pairs from each block and stitches block boundaries via
    the per-block (first, last) rows — O(2 × num_blocks) driver data.
    Requires the executor to preserve block order (sort output does).
    """
    from ray.data import DataContext
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True   # block order == sort order
    try:
        return _adjacent_pairs_ordered(sorted_ds, cols)
    finally:
        ctx.execution_options.preserve_order = prev


def _adjacent_pairs_ordered(sorted_ds: rd.Dataset, cols: list[str]
                            ) -> list[tuple[dict, dict]]:
    pairs: list[tuple[dict, dict]] = []
    boundary: list[tuple[dict, dict]] = []   # (first, last) per block
    for batch in sorted_ds.select_columns(cols).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        rows = batch.to_pylist()
        for i in range(len(rows) - 1):
            pairs.append((rows[i], rows[i + 1]))
        boundary.append((rows[0], rows[-1]))
    for k in range(len(boundary) - 1):
        pairs.append((boundary[k][1], boundary[k + 1][0]))
    return pairs


def order_edges(events: rd.Dataset) -> pd.DataFrame:
    """R8: sort deduped events by (era_ord, year, event_key); adjacent
    pairs → `before` edges."""

    def add_ord(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["era_ord"] = [vocab.ERA_ORDER.get(e, -1) for e in df["era"]]
        return df

    sorted_ds = (events.map_batches(add_ord, batch_format="pandas")
                 .sort(["era_ord", "year", "event_key"]))
    pairs = adjacent_pairs(sorted_ds, ["event_key", "era_ord", "year"])
    rows = []
    for a, b in pairs:
        if a["era_ord"] != b["era_ord"]:
            conf = 0.95
        elif a["year"] != b["year"]:
            conf = 0.9
        else:
            continue
        rows.append((a["event_key"], "before", b["event_key"], conf))
    return pd.DataFrame(rows, columns=["event1", "relation", "event2",
                                       "confidence"])
