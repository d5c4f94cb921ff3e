#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mimics the driver's
DuckDB compare: per query, sort columns by name, sort rows, compare).

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def check(sf_dir, out_dir):
    """Oracle-compare every key; returns {key: 'ok' | '<failure tag>'}."""
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"{name:28s} MISSING spark output"); n_bad += 1
            results[name] = "missing-output"; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"{name:28s} SPARK READ FAIL {e}"); n_bad += 1
            results[name] = "spark-read-fail"; continue
        try:
            rel = con.sql(sql)
            duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
            want = rel.df()
        except Exception as e:
            print(f"{name:28s} ORACLE FAIL {str(e)[:120]}"); n_bad += 1
            results[name] = "oracle-fail"; continue
        # The driver reads both sides into pandas and hashes values; DuckDB
        # HUGEINT/DECIMAL become float64 there and hash-mismatch Spark's
        # BIGINT even when values are equal. Fail locally so the driver never
        # sees it (CORRECTNESS_r02 skew_join was exactly this).
        loose = [c for c, t in duck_types.items()
                 if "HUGEINT" in t or t.startswith("DECIMAL")]
        if loose:
            print(f"{name:28s} ORACLE TYPE {[(c, duck_types[c]) for c in loose]} — wrap in CAST(... AS BIGINT/DOUBLE)")
            n_bad += 1; results[name] = "oracle-type"; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"{name:28s} COLS differ spark={list(g.columns)} duck={list(w.columns)}"); n_bad += 1
            results[name] = "cols-differ"; continue
        if len(g) != len(w):
            print(f"{name:28s} ROWS differ spark={len(g)} duck={len(w)}"); n_bad += 1
            results[name] = "rows-differ"; continue
        dt_bad = [c for c in g.columns if g[c].dtype != w[c].dtype]
        if dt_bad:
            print(f"{name:28s} DTYPE differ {[(c, str(g[c].dtype), str(w[c].dtype)) for c in dt_bad]}")
            n_bad += 1; results[name] = "dtype-differ"; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            print(f"{name:28s} OK ({len(g)} rows)"); n_ok += 1
            results[name] = "ok"
        except AssertionError as e:
            # retry with tolerance to distinguish float-noise from real bugs
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=1e-9)
                print(f"{name:28s} FLOAT-NOISE ({len(g)} rows)"); n_bad += 1
                results[name] = "float-noise"
            except AssertionError:
                print(f"{name:28s} VALUES differ: {str(e).splitlines()[0][:100]}"); n_bad += 1
                results[name] = "values-differ"
    print(f"\n{n_ok} ok, {n_bad} bad")
    return results

def main(sf_dir, out_dir):
    results = check(sf_dir, out_dir)
    return 1 if any(v != "ok" for v in results.values()) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
