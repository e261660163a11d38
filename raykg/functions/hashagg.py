"""Bucketed two-phase aggregation — the engine's scalable groupby.

Ray Data's ``groupby().aggregate()`` / ``map_groups()`` pay Python-level
per-GROUP overhead (block slicing + callback per group), which collapses on
high-cardinality keys: a 74k-row / 64k-group Count measured 179 s on one
node, while the equivalent bucketed plan below runs 5M rows / 3.8M groups
in 2.5 s.  The trick:

1. **partial** (combiner): vectorized groupby inside each input batch —
   shrinks the shuffle payload to one row per (batch, key).  The built-in
   helpers (`count_rows` / `sum_col` / `distinct` / `first_by`) run their
   combiners in polars over zero-copy Arrow batches: pandas object-dtype
   string keys made a 13M-row sum 20× slower than int keys; polars'
   native string hashing/grouping removes most of that gap.
2. bucket column = ``row_hash(keys) % num_buckets`` — every key lives in
   exactly one bucket.  Bucket assignment only co-locates; it never
   affects results, so any fast deterministic hash is fine.
3. **materialize barrier** before the bucket groupby: Ray's sort-based
   shuffle SAMPLES its input to pick range boundaries, which re-executes a
   lazy upstream — composing map→groupby lazily measured 48 s where
   map-then-barrier-then-groupby measured 13 s.  The barrier holds only
   post-combiner (already reduced) data, i.e. it is the shuffle-write a
   distributed SQL engine would do anyway.
4. ``groupby("__bucket").map_groups(final)`` — Python-level grouping over
   *num_buckets* groups (a knob sized to the cluster, not the key
   cardinality); per-key aggregation inside each bucket is vectorized.

Skew note: a single hot KEY still lands in one bucket, but its rows were
already combined per batch by the partial pass, so the bucket receives
O(#batches) rows per key, not O(#occurrences) — the salting the north rule
asks for falls out of the combiner
(tests/test_components.py::test_hashagg_extreme_skew).

Reference semantics served by this module: triple merge A1
(``models/relationships.py:114-125``), mention counting A2
(``graph/writer.py:121-127``), co-occurrence C1
(``extract/dynamic_resolver.py:186-194``), exact dedup R6
(``lore/events.py:381-395``), vocabulary counting A8
(``style/metrics.py:233-308``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
import pyarrow as pa

import ray.data as rd

DEFAULT_BUCKETS = 64


def _pl():
    import polars as pl
    return pl


def _bucket_expr(d, keys: list[str], num_buckets: int):
    pl = _pl()
    return (d.select(keys).hash_rows() % num_buckets).cast(pl.Int64)


def _finish(mapped: rd.Dataset, per_bucket, coalesce: int | None,
            num_buckets: int = DEFAULT_BUCKETS,
            barrier: bool = True) -> rd.Dataset:
    # barrier=False skips the materialize for upstreams that are already
    # materialized-and-cheap (e.g. a filter over a materialized dataset):
    # groupby's sort-sampling re-executes the lazy upstream, which is only
    # harmful when that upstream is expensive.  Saves one full execution
    # (~1 s scheduling floor) per aggregation.
    mat = mapped.materialize() if barrier else mapped
    # groupby's sample-sort creates one partition PER INPUT BLOCK: when the
    # combiner ran over hundreds of read tasks, the partials arrive as
    # hundreds of sub-MB blocks and the sort degenerates into an
    # O(blocks^2) exchange of tiny objects (measured 14 s for 811k rows /
    # 277 MB at 400 blocks vs ~2 s at 64).  Coalesce partials to ~1 block
    # per bucket first — a cheap linear pass over the (combined) partials.
    # (num_blocks is only known post-materialize; the barrier=False path
    # inherits its upstream's block count, already bounded by its caller.)
    if barrier and mat.num_blocks() > num_buckets * 2:
        mat = mat.repartition(num_buckets)
    out = (mat.groupby("__bucket")
           .map_groups(per_bucket, batch_format="pandas"))
    if coalesce is not None:
        out = out.repartition(coalesce)
    return out


def grouped_apply(ds: rd.Dataset, keys: Sequence[str],
                  final_fn: Callable[[pd.DataFrame], pd.DataFrame],
                  partial_fn: Callable[[pd.DataFrame], pd.DataFrame]
                  | None = None,
                  num_buckets: int = DEFAULT_BUCKETS,
                  coalesce: int | None = None) -> rd.Dataset:
    """Co-locate rows by hash(keys) bucket, then apply ``final_fn`` once per
    bucket.  ``final_fn`` receives ALL rows of every key in its bucket and
    must aggregate per key itself (vectorized pandas groupby — never a
    Python loop over keys).  ``partial_fn`` (optional combiner) runs per
    input batch BEFORE the shuffle.

    ``coalesce``: repartition the output into that many blocks.  Required
    when the output feeds a ``Dataset.join``: ``map_groups`` emits
    ZERO-COLUMN empty blocks for empty sort partitions, and Arrow's hash
    join fails schema resolution on them ("No match for FieldRef") —
    repartition concatenates them away."""
    keys = list(keys)
    pl = _pl()

    def add_bucket(df: pd.DataFrame):
        if partial_fn is not None:
            df = partial_fn(df)
        out = df.copy()
        if len(df) == 0:
            out["__bucket"] = pd.Series([], dtype="int64")
            return out
        # positional assignment (.to_numpy) — partial_fn may return frames
        # with non-Range indexes, and Series assignment would align on them
        d = pl.from_pandas(out.reset_index(drop=True))
        d = d.with_columns(_bucket_expr(d, keys, num_buckets)
                           .alias("__bucket"))
        # ship ARROW blocks through the materialize + sort exchange:
        # pandas object-dtype string columns pickle per-Python-string,
        # Arrow buffers serialize zero-copy — measured 8.2 s -> 6.9 s on
        # the sf4 triples stage at 32 CPUs.  Fall back to pandas for
        # partials polars/arrow can't represent.
        try:
            return d.to_arrow()
        except Exception:
            return d.to_pandas()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns="__bucket"))

    return _finish(ds.map_batches(add_bucket, batch_format="pandas"),
                   per_bucket, coalesce, num_buckets)


def _pl_two_phase(ds: rd.Dataset, keys: list[str], agg_exprs_partial,
                  agg_exprs_final, num_buckets: int,
                  coalesce: int | None, barrier: bool = True) -> rd.Dataset:
    """Shared polars partial→bucket→final plan for the builtin helpers."""
    pl = _pl()

    def partial(t: pa.Table) -> pa.Table:
        g = pl.from_arrow(t).group_by(keys).agg(agg_exprs_partial)
        return g.with_columns(
            _bucket_expr(g, keys, num_buckets).alias("__bucket")).to_arrow()

    def final(gdf: pd.DataFrame) -> pd.DataFrame:
        d = pl.from_pandas(gdf.drop(columns="__bucket"))
        return (d.group_by(keys).agg(agg_exprs_final)
                .sort(keys).to_pandas())

    return _finish(ds.map_batches(partial, batch_format="pyarrow"),
                   final, coalesce, num_buckets, barrier=barrier)


def count_rows(ds: rd.Dataset, keys: Sequence[str], name: str = "count",
               num_buckets: int = DEFAULT_BUCKETS,
               coalesce: int | None = None) -> rd.Dataset:
    """groupby(keys).count() — partial counts per batch, summed per key."""
    pl = _pl()
    return _pl_two_phase(ds, list(keys),
                         [pl.len().cast(pl.Int64).alias(name)],
                         [pl.col(name).sum()], num_buckets, coalesce)


def sum_col(ds: rd.Dataset, keys: Sequence[str], col: str,
            name: str | None = None,
            num_buckets: int = DEFAULT_BUCKETS,
            coalesce: int | None = None,
            barrier: bool = True) -> rd.Dataset:
    """groupby(keys).sum(col) with a per-batch combiner."""
    pl = _pl()
    name = name or col
    return _pl_two_phase(ds, list(keys),
                         [pl.col(col).sum().alias(name)],
                         [pl.col(name).sum()], num_buckets, coalesce,
                         barrier=barrier)


def distinct(ds: rd.Dataset, keys: Sequence[str],
             num_buckets: int = DEFAULT_BUCKETS,
             coalesce: int | None = None) -> rd.Dataset:
    """Distinct key combinations (dedup with per-batch combiner)."""
    keys = list(keys)
    pl = _pl()

    def partial(t: pa.Table) -> pa.Table:
        g = pl.from_arrow(t).select(keys).unique()
        return g.with_columns(
            _bucket_expr(g, keys, num_buckets).alias("__bucket")).to_arrow()

    def final(gdf: pd.DataFrame) -> pd.DataFrame:
        return (pl.from_pandas(gdf.drop(columns="__bucket"))
                .unique().sort(keys).to_pandas())

    return _finish(ds.map_batches(partial, batch_format="pyarrow"),
                   final, coalesce, num_buckets)


def sum_col_contiguous(ds: rd.Dataset, keys: Sequence[str], col: str,
                       contig_key: str, name: str | None = None
                       ) -> rd.Dataset:
    """groupby(keys).sum(col) for datasets where all rows of any given
    ``contig_key`` value are CONTIGUOUS in file order (e.g. mention rows:
    one unit's mentions are emitted by one task into one file run).

    Under that invariant a global all-to-all is wasted motion — at sf4 the
    (entity, unit) aggregation shuffled 8.45M rows / 550 MB to merge only
    5% duplicates, and the sort stage scaled 0.92× from 8→32 CPUs (shared
    memory bus).  Instead:

    1. per-block vectorized groupby (the real work, embarrassingly
       parallel);
    2. groups belonging to each block's FIRST or LAST ``contig_key`` value
       are the only ones that can straddle a block/row-group boundary —
       tag them and re-aggregate ONLY those through the bucketed plan
       (O(2 × num_blocks) key groups, vocabulary-sized);
    3. interior groups stream through untouched.

    Blocks from ``read_parquet`` are contiguous slices of single files (or
    concatenations of whole files), so a contig_key run never interleaves —
    the sf0.01 DuckDB oracle cross-checks the invariant every round."""
    keys = list(keys)
    name = name or col
    pl = _pl()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], t.schema.field(k).type)
                                for k in keys},
                             name: pa.array([], pa.int64()),
                             "__edge": pa.array([], pa.bool_())})
        d = pl.from_arrow(t)
        g = d.group_by(keys).agg(pl.col(col).sum().cast(pl.Int64)
                                 .alias(name))
        first, last = d[contig_key][0], d[contig_key][-1]
        return g.with_columns(
            pl.col(contig_key).is_in([first, last]).alias("__edge")
        ).to_arrow()

    assert contig_key in keys, "contig_key must be a group key"

    def side(want: bool):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["__edge"], want)).drop(["__edge"])
        return f

    marked = ds.map_batches(partial, batch_format="pyarrow").materialize()
    interior = marked.map_batches(side(False), batch_format="pyarrow")
    boundary = marked.map_batches(side(True), batch_format="pyarrow")
    # keep the barrier: barrier=False looked like a free execution saved,
    # but the groupby sampler re-executes the boundary FILTER, i.e. a
    # second full scan of `marked` — measured 8.4 s vs 4.5 s for this
    # stage at sf8/32 CPUs.  The materialize holds only the tiny filtered
    # boundary rows.
    return interior.union(sum_col(boundary, keys, name, name=name))


def range_grouped_apply(ds: rd.Dataset, keys: Sequence[str],
                        final_fn: Callable[[pd.DataFrame], pd.DataFrame],
                        partial_fn: Callable[[pd.DataFrame], pd.DataFrame]
                        | None = None,
                        num_buckets: int = DEFAULT_BUCKETS,
                        sample_per_block: int = 32) -> rd.Dataset:
    """``grouped_apply`` whose buckets are contiguous RANGES of ``keys[0]``
    instead of hash slots, so the output stream is globally sorted by
    ``keys[0]`` (and by ``keys`` when ``final_fn`` returns its bucket
    sorted by keys) WITHOUT a second full-payload sort exchange.

    Range-bucketing folds the ordering into the one shuffle the
    aggregation already pays: ``groupby("__bucket")``'s sort-by-bucket
    places blocks in ascending bucket order, and range buckets make that
    order the key order.

    WHEN TO USE (measured): only when the aggregated OUTPUT is itself
    corpus-scaled, so that a separate ``Dataset.sort`` of the result would
    be a second LARGE all-to-all.  For the triples stage the merged table
    is sub-linear (103 MB at sf4) and sorting it is cheap — isolated A/B
    at 32 CPUs measured hash-bucket-merge + small-sort at 8.25 s (sf4) /
    12.5 s (sf8) vs this range path at 10.6 s / 13.9 s: the extra
    boundary-sample pass and the unfused ``add_bucket`` pass cost more
    than the small sort they replace.  The triples stage therefore keeps
    the hash path; this primitive is for future corpus-scaled sorted
    outputs.

    Boundaries are sampled from the MATERIALIZED partials (every
    len/``sample_per_block``-th row per block → O(blocks × 32) driver rows,
    bounded); sampling only affects bucket balance, never grouping or
    order, so nondeterministic block order is harmless — the same
    guarantee Ray's own sample-sort gives.  All rows of one key[0] value
    land in one bucket (boundaries are key values; ``side='right'``), so
    per-key aggregation stays exact.  Extreme skew note: a hot key[0]
    collapses sample quantiles and its bucket degenerates toward one big
    range, but the per-batch combiner already bounded rows-per-key to
    O(#input blocks)."""
    import numpy as np
    keys = list(keys)
    range_key = keys[0]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if partial_fn is not None:
            df = partial_fn(df)
        return df.reset_index(drop=True)

    mat = ds.map_batches(partial, batch_format="pandas").materialize()

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"__k": pd.Series([], dtype="object")})
        step = max(1, len(df) // sample_per_block)
        return pd.DataFrame({"__k": df[range_key].iloc[::step]})

    samp = sorted(r["__k"] for r in
                  mat.map_batches(sample, batch_format="pandas").take_all())
    if samp:
        qs = np.linspace(0, len(samp) - 1, num_buckets + 1)[1:-1]
        bounds = np.asarray(sorted({samp[int(q)] for q in qs}), dtype=str)
    else:
        bounds = np.asarray([], dtype=str)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__bucket"] = pd.Series([], dtype="int64")
            return df
        # numpy '<U' arrays: C-level string compare in the binary search
        k = df[range_key].to_numpy(dtype=str)
        df["__bucket"] = np.searchsorted(bounds, k,
                                         side="right").astype("int64")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns="__bucket"))

    # coalesce partials to ~1 block per bucket BEFORE the bucket groupby —
    # same pathology _finish guards against: at high read parallelism the
    # combiner leaves hundreds of sub-MB blocks and groupby's sample-sort
    # (one partition per input block) degenerates into an exchange of tiny
    # objects.  Measured on the triples stage at sf4: 12.1 s → 8.5 s at
    # 32 CPUs with this coalesce.
    if mat.num_blocks() > num_buckets * 2:
        mat = mat.repartition(num_buckets)
    return (mat.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pandas"))


def first_by(ds: rd.Dataset, keys: Sequence[str], order_by: Sequence[str],
             num_buckets: int = DEFAULT_BUCKETS) -> rd.Dataset:
    """groupby(keys).first() with deterministic in-group order (R6 exact
    dedup: first occurrence by ``order_by`` wins)."""
    keys, order_by = list(keys), list(order_by)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_by, kind="mergesort")
                .drop_duplicates(subset=keys, keep="first"))

    return grouped_apply(ds, keys, pick, pick, num_buckets)


def cogroup_apply(sources, keys: Sequence[str],
                  final_fn: Callable[[list[pd.DataFrame]], pd.DataFrame],
                  num_buckets: int = DEFAULT_BUCKETS,
                  coalesce: int | None = None) -> rd.Dataset:
    """Co-group N datasets through ONE bucketed shuffle (Spark's cogroup).

    ``sources``: list of ``(ds, partial_fn, columns)`` where ``columns`` is
    a dict of the partial output's column name → pandas dtype string (keys
    included).  Every source's partials are padded to the UNION of all
    sources' columns (typed nulls) + a ``__src`` marker, unioned, and
    shuffled once on ``hash(keys)``; ``final_fn`` receives one DataFrame
    per source (only that source's columns) holding all rows of the bucket
    and returns the merged/aggregated result.

    This replaces the aggregate→aggregate→``Dataset.join`` plan (two
    shuffles + a hash-join operator whose aggregator-actor startup costs
    seconds even on empty inputs) with a single shuffle: same key lives in
    the same bucket for every source, so the merge is a vectorized
    in-bucket pandas merge."""
    keys = list(keys)
    pl = _pl()
    all_cols: dict[str, str] = {}
    for _, _, cols in sources:
        for c, dt in cols.items():
            all_cols.setdefault(c, dt)

    def wrap(src_idx: int, partial_fn, own_cols: dict[str, str]):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if partial_fn is not None:
                df = partial_fn(df)
            df = df.reset_index(drop=True)
            out = pd.DataFrame(index=df.index)
            for c, dt in all_cols.items():
                if c in own_cols:
                    out[c] = df[c].astype(dt)
                else:
                    # pd.NA can't live in numpy int/bool dtypes — pad
                    # missing columns with the nullable-extension twin
                    ndt = {"int64": "Int64", "int32": "Int32",
                           "bool": "boolean", "float64": "Float64"}.get(dt, dt)
                    out[c] = pd.Series(pd.NA, index=df.index, dtype=ndt)
            out["__src"] = src_idx
            if len(out) == 0:
                out["__bucket"] = pd.Series([], dtype="int64")
            else:
                out["__bucket"] = _bucket_expr(
                    pl.from_pandas(out[keys]), keys, num_buckets).to_numpy()
            # ship Arrow through the exchange (see grouped_apply); the
            # pandas round-trip in per_bucket turns nullable ints/bools
            # into float64/object — per_bucket casts back via `cols`.
            # Strip the from_pandas 'pandas' schema metadata: dicts make
            # pa.Schema unhashable, and every shuffle reduce that concats
            # such blocks logs "Failed to hash the schemas" from worker
            # processes the raykg log filter can't reach.
            try:
                return pa.Table.from_pandas(
                    out, preserve_index=False).replace_schema_metadata(None)
            except Exception:
                return out
        return f

    mapped = sources[0][0].map_batches(
        wrap(0, sources[0][1], sources[0][2]), batch_format="pandas")
    for i, (ds, pf, cols) in enumerate(sources[1:], start=1):
        mapped = mapped.union(
            ds.map_batches(wrap(i, pf, cols), batch_format="pandas"))

    _NULLABLE_TWIN = {"int64": "Int64", "int32": "Int32",
                      "bool": "boolean", "float64": "Float64"}

    def _restore_dtypes(sub: pd.DataFrame, cols: dict[str, str]
                        ) -> pd.DataFrame:
        # Restore each source's declared dtypes after the arrow->pandas
        # round-trip widened null-padded Int64/boolean to float64/object.
        # Cast through the NULLABLE extension twin first: a source whose
        # own int/bool column legitimately contains nulls would make a
        # direct astype('int64') raise ValueError; such columns keep the
        # nullable dtype (Int64/boolean) instead.  Note: int64 values
        # above 2^53 in a null-PADDED column still lose precision in the
        # float64 detour Ray's pandas conversion takes — keys that large
        # should be strings (every current caller's keys are).
        out = pd.DataFrame(index=sub.index)
        for c, dt in cols.items():
            twin = _NULLABLE_TWIN.get(dt)
            if twin is None:
                out[c] = sub[c].astype(dt)
                continue
            s = sub[c].astype(twin)
            out[c] = s if s.isna().any() else s.astype(dt)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        frames = []
        for i, (_, _, cols) in enumerate(sources):
            frames.append(_restore_dtypes(g[g["__src"] == i][list(cols)],
                                          cols))
        return final_fn(frames)

    return _finish(mapped, per_bucket, coalesce, num_buckets)


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Materialize ``ds`` and rebuild it WITHOUT zero-row blocks.

    ``map_groups`` (empty sort partitions) and ``repartition`` (fewer rows
    than partitions) emit ZERO-COLUMN empty blocks.  They are
    uncorrectable downstream: Ray skips empty blocks when applying
    ``map_batches`` UDFs, so the schema-less empties pass through every
    transform untouched — and when a hash-join partition happens to
    receive only such a block on one side, Arrow's join fails schema
    resolution ("No match for FieldRef", flaky because it depends on how
    keys hash across partitions; observed on the components chain at tiny
    scale where rows < partitions).  The ``coalesce`` repartition
    mitigation only merges empties away while every output partition
    still gets rows.

    Cost: one materialize (callers pass already-materialized datasets —
    then it's metadata-only when no empties exist, the common big-data
    case).  When empties ARE present, each surviving block's format is
    probed by a tiny remote task (a bool comes back, the block doesn't)
    and the dataset is rebuilt from the surviving block refs."""
    import ray

    mat = ds.materialize()
    keep, n_empty = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                keep.append(ref)
            else:
                n_empty += 1
    if not n_empty or not keep:
        return mat

    @ray.remote(num_cpus=0)
    def _is_arrow(block) -> bool:
        return isinstance(block, pa.Table)

    flags = ray.get([_is_arrow.remote(r) for r in keep])
    arrow_refs = [r for r, f in zip(keep, flags) if f]
    pandas_refs = [r for r, f in zip(keep, flags) if not f]
    parts = []
    if arrow_refs:
        parts.append(rd.from_arrow_refs(arrow_refs))
    if pandas_refs:
        parts.append(rd.from_pandas_refs(pandas_refs))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.materialize()


def arrow_clean(ds: rd.Dataset) -> rd.Dataset:
    """Convert blocks to Arrow and strip schema-level key-value metadata.

    Pandas blocks entering a hash shuffle (join aggregators) are converted
    with the ``pandas`` metadata dict attached, which makes ``pa.Schema``
    unhashable and logs "Failed to hash the schemas" from worker processes
    the driver-side log filter can't reach.  This map fuses into the
    upstream task stage — metadata-only, zero-copy."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def coalesced_join(left: rd.Dataset, right: rd.Dataset, on,
                   join_type: str = "inner",
                   num_partitions: int = 8) -> rd.Dataset:
    """``Dataset.join`` + metadata-clean inputs + repartition of the output.

    Ray 2.49's hash join emits EMPTY blocks with no schema
    (``PandasBlockSchema(names=[])``) for empty partitions; any downstream
    join / shuffle consuming them dies with ``ArrowInvalid: No match or
    multiple matches for key field``.  Repartitioning merges the empties
    into schema-bearing blocks.  Use this for every join whose output
    feeds another join or aggregation.  Inputs pass through
    :func:`arrow_clean` so pandas blocks never reach the join aggregators
    with unhashable dict metadata."""
    out = arrow_clean(left).join(arrow_clean(right), join_type=join_type,
                                 num_partitions=num_partitions, on=on)
    return out.repartition(max(2, num_partitions // 2))
