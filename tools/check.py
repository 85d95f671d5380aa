#!/usr/bin/env python3
"""Local pre-flight oracle check (mimics the driver's CORRECTNESS gate).

Usage: /root/.pyenv/versions/3.11.7/bin/python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, canonicalizes (sort columns by name, then rows), and compares
cell-by-cell. Dev tool only — never shipped as part of the library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: timestamps → ns, ints → int64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.reset_index(drop=True)


def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        a_float = pd.api.types.is_float_dtype(a[c])
        b_float = pd.api.types.is_float_dtype(b[c])
        a_int = pd.api.types.is_integer_dtype(a[c])
        b_int = pd.api.types.is_integer_dtype(b[c])
        # the driver hashes rendered values, so int64 vs float is a real
        # mismatch (1234 vs 1234.0) even when numerically equal — fail it here
        if (a_float and b_int) or (a_int and b_float):
            return (f"col {c} dtype-class mismatch: spark={a[c].dtype} "
                    f"oracle={b[c].dtype} (driver hash renders these differently)")
        if a_float or b_float:
            af = pd.to_numeric(a[c], errors="coerce").astype(float).values
            bf = pd.to_numeric(b[c], errors="coerce").astype(float).values
            nan_ok = np.isnan(af) == np.isnan(bf)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not (nan_ok.all() and eq.all()):
                i = int(np.argmin(nan_ok & eq))
                return f"col {c} differs at row {i}: spark={af[i]!r} oracle={bf[i]!r}"
        else:
            eq = pd.Series(av).astype(str).values == pd.Series(bv).astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                return f"col {c} differs at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)])
    n_pass = n_fail = n_noora = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            n_noora += 1
            continue
        try:
            ora_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        err = cmp(spark_df, ora_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
