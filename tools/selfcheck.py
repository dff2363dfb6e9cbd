#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify
output dir vs DuckDB oracle on the same sf dir. Dev-only tool (the
shipped Scala library does not depend on this)."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # strip tz if any column came back tz-aware
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, list) else v))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.read_parquet(os.path.join(out_dir, name)))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1; continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name}: {got.shape[0]} rows"); n_ok += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: " + " | ".join(msg[:6])); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
