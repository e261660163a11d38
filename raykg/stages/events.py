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
``map_batches`` (vectorized shifted-column compare) and STREAM to a
parquet sink; only the 2 boundary-marker rows per block reach the driver
(parquet filter pushdown), which stitches the O(num_blocks) cross-block
pairs and appends them.
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


_EMPTY_EDGES = {"event1": pd.Series([], dtype=str),
                "relation": pd.Series([], dtype=str),
                "event2": pd.Series([], dtype=str),
                "confidence": pd.Series([], dtype="float64")}


def order_edges(events: rd.Dataset,
                edges_out: str | None = None) -> rd.Dataset:
    """R8: sort deduped events by (era_ord, year, event_key); adjacent
    pairs → `before` edges.

    In-block pairs are emitted INSIDE ``map_batches`` over the sorted
    Dataset (vectorized numpy compare of shifted columns) and every block
    STREAMS its edges straight to a parquet sink (``edges_out``, a /tmp
    scratch dir by default) — edge rows never touch the driver.  The
    driver then reads back ONLY the O(2 × num_blocks) boundary-marker
    rows via parquet filter pushdown, reconstructs block adjacency by
    sorting the markers on the events' own sort key (blocks are
    contiguous ranges of the global sort, and ``event_key`` is unique
    after :func:`dedup_events`, so ``(m_era, m_year, event1, marker)``
    ordering IS block order), and appends the stitched cross-block
    edges.  Driver memory is O(num_blocks), independent of event count
    (tests/test_dialogue_events.py::test_order_edges_driver_bounded).

    Returns a Dataset with columns (event1, relation, event2, confidence).
    """
    import os
    import tempfile

    import pyarrow.dataset as pads

    def add_ord(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["era_ord"] = [vocab.ERA_ORDER.get(e, -1) for e in df["era"]]
        return df

    sorted_ds = (events.map_batches(add_ord, batch_format="pandas")
                 .sort(["era_ord", "year", "event_key"])
                 .select_columns(["event_key", "era_ord", "year"])
                 .map_batches(_block_edges_and_markers,
                              batch_format="pyarrow", batch_size=None))

    out_dir = edges_out or tempfile.mkdtemp(prefix="raykg_event_edges_")
    sorted_ds.write_parquet(out_dir)

    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    if not files:                                    # zero events
        return rd.from_pandas(pd.DataFrame(_EMPTY_EDGES))

    # driver side: marker rows only (filter pushdown at the read)
    markers = (pads.dataset(out_dir)
               .to_table(filter=pads.field("marker") != 0,
                         columns=["event1", "marker", "m_era", "m_year"])
               .to_pandas()
               .sort_values(["m_era", "m_year", "event1", "marker"],
                            kind="mergesort").reset_index(drop=True))
    stitched = []
    for i in range(len(markers) - 1):
        a, b = markers.iloc[i], markers.iloc[i + 1]
        if a["marker"] == 2 and b["marker"] == 1:    # last_k → first_{k+1}
            conf = _edge_conf(a["m_era"], b["m_era"],
                              a["m_year"], b["m_year"])
            if conf > 0:
                stitched.append((a["event1"], "before", b["event1"], conf))

    def finish(t):
        import pyarrow as pa
        return pa.table({
            "event1": t["event1"],
            "relation": pa.array(["before"] * t.num_rows, pa.string()),
            "event2": t["event2"],
            "confidence": t["confidence"],
        })

    edge_ds = (rd.read_parquet(out_dir, filter=pads.field("marker") == 0,
                               columns=["event1", "event2", "confidence",
                                        "marker"])
               .map_batches(finish, batch_format="pyarrow"))
    if stitched:
        edge_ds = edge_ds.union(rd.from_pandas(pd.DataFrame(
            stitched,
            columns=["event1", "relation", "event2", "confidence"])))
    return edge_ds
