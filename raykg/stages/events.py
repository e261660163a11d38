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

``order_edges`` solves the sorted-Dataset window problem (SURVEY.md §7.4)
distributively: in-block adjacent-pair edges are computed INSIDE
``map_batches`` (vectorized shifted-column compare), and each block ships
only its edge rows plus 2 boundary-marker rows; the driver stitches the
O(num_blocks) cross-block pairs.
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


def _edge_conf(era_a, era_b, year_a, year_b) -> float:
    """R8 edge rule: cross-era 0.95, cross-year-within-era 0.90, equal
    (era, year) → no edge (0.0)."""
    if era_a != era_b:
        return 0.95
    if year_a != year_b:
        return 0.9
    return 0.0


def _block_edges_and_markers(t):
    """Per-block (worker-side) adjacent-pair edges, vectorized, PLUS the
    block's (first, last) marker rows so the driver can stitch the O(1)
    cross-block boundary pairs.  Output per block = in-block edges +
    exactly 2 marker rows — the driver never sees raw event rows."""
    import numpy as np
    import pyarrow as pa
    keys = t["event_key"].to_pylist()
    era = t["era_ord"].to_numpy(zero_copy_only=False)
    year = t["year"].to_numpy(zero_copy_only=False)
    n = len(keys)
    e1, e2, conf = [], [], []
    if n >= 2:
        de = era[1:] != era[:-1]
        dy = year[1:] != year[:-1]
        c = np.where(de, 0.95, np.where(dy, 0.9, 0.0))
        keep = np.nonzero(c > 0)[0]
        e1 = [keys[i] for i in keep]
        e2 = [keys[i + 1] for i in keep]
        conf = [float(c[i]) for i in keep]
    m_marker = [0] * len(e1)
    m_era = [0] * len(e1)
    m_year = [0] * len(e1)
    if n >= 1:   # first / last marker rows (equal when n == 1)
        for pos, flag in ((0, 1), (n - 1, 2)):
            e1.append(keys[pos])
            e2.append("")
            conf.append(0.0)
            m_marker.append(flag)
            m_era.append(int(era[pos]))
            m_year.append(int(year[pos]))
    return pa.table({
        "event1": pa.array(e1, pa.string()),
        "event2": pa.array(e2, pa.string()),
        "confidence": pa.array(conf, pa.float64()),
        "marker": pa.array(m_marker, pa.int8()),
        "m_era": pa.array(m_era, pa.int64()),
        "m_year": pa.array(m_year, pa.int64()),
    })


def order_edges(events: rd.Dataset) -> pd.DataFrame:
    """R8: sort deduped events by (era_ord, year, event_key); adjacent
    pairs → `before` edges.

    In-block pairs are emitted INSIDE ``map_batches`` over the sorted
    Dataset (vectorized numpy compare of shifted columns); only the final
    edge rows plus 2 marker rows per block reach the driver, where the
    block boundaries are stitched.  At write-to-parquet scale the edge
    batches would stream to a sink instead of collecting."""

    def add_ord(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["era_ord"] = [vocab.ERA_ORDER.get(e, -1) for e in df["era"]]
        return df

    sorted_ds = (events.map_batches(add_ord, batch_format="pandas")
                 .sort(["era_ord", "year", "event_key"])
                 .select_columns(["event_key", "era_ord", "year"])
                 .map_batches(_block_edges_and_markers,
                              batch_format="pyarrow", batch_size=None))

    from ray.data import DataContext
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True   # block order == sort order
    try:
        batches = [b for b in sorted_ds.iter_batches(
            batch_size=None, batch_format="pandas") if len(b)]
    finally:
        ctx.execution_options.preserve_order = prev

    edges = [b[b["marker"] == 0] for b in batches]
    # stitch block boundaries: last marker of block k × first of block k+1
    firsts = [b[b["marker"] == 1].iloc[0] for b in batches]
    lasts = [b[b["marker"] == 2].iloc[0] for b in batches]
    stitched = []
    for k in range(len(batches) - 1):
        a, b = lasts[k], firsts[k + 1]
        conf = _edge_conf(a["m_era"], b["m_era"], a["m_year"], b["m_year"])
        if conf > 0:
            stitched.append((a["event1"], b["event1"], conf))
    out = pd.concat(edges, ignore_index=True) if edges else pd.DataFrame(
        columns=["event1", "event2", "confidence"])
    if stitched:
        out = pd.concat([out[["event1", "event2", "confidence"]],
                         pd.DataFrame(stitched, columns=[
                             "event1", "event2", "confidence"])],
                        ignore_index=True)
    out = out[["event1", "event2", "confidence"]].copy()
    out.insert(1, "relation", "before")
    return out.reset_index(drop=True)
