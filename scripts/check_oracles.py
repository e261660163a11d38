"""Self-check harness mimicking the driver: run each queries() callable and
its oracle_sql() side-by-side, compare row count + column names +
order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def normalize(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(9)
        elif dt.startswith(("int", "uint", "Int", "UInt")):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_res, sql: str, con) -> str:
    import pandas as pd
    import ray.data as rd
    if isinstance(ray_res, rd.Dataset):
        rdf = ray_res.to_pandas()
    elif isinstance(ray_res, pd.DataFrame):
        rdf = ray_res
    else:
        rdf = ray_res.to_pandas()
    odf = con.sql(sql).df()
    if set(rdf.columns) != set(odf.columns):
        return f"SCHEMA MISMATCH ray={sorted(rdf.columns)} sql={sorted(odf.columns)}"
    if len(rdf) != len(odf):
        return f"ROWCOUNT ray={len(rdf)} sql={len(odf)}"
    a, b = normalize(rdf), normalize(odf)
    if not a.equals(b):
        diff_mask = ~(a == b).all(axis=1)
        n = int(diff_mask.sum())
        ex = ""
        if n:
            i = diff_mask.idxmax()
            ex = f" first diff row {i}:\n ray {a.loc[i].to_dict()}\n sql {b.loc[i].to_dict()}"
        return f"VALUES {n} differing rows{ex}"
    return f"OK ({len(rdf)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import duckdb
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raykg.pipelines import queries as Q
    from raykg.sources import synthetic_corpus as sc
    sc.generate(sf_dir)

    names = sys.argv[2:] or list(Q.QUERY_FNS)
    con = duckdb.connect()
    # mimic driver: register testdata views
    import os
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        f = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(f):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

    failures = 0
    for name in names:
        try:
            res = Q.QUERY_FNS[name](sf_dir)
            if name in getattr(Q, "NO_ORACLE", ()):
                n = res.count() if hasattr(res, "count") else len(res)
                verdict = f"OK-rows-only ({n} rows, no oracle)"
            else:
                sql = Q.oracle_for(name, sf_dir)
                verdict = compare(name, res, sql, con)
        except Exception as e:
            import traceback
            verdict = f"ERROR {type(e).__name__}: {e}"
            traceback.print_exc()
        print(f"{name:24s} {verdict}")
        if not verdict.startswith("OK"):
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
