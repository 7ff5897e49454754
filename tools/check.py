#!/usr/bin/env python3
"""Local correctness check, mirroring the driver's oracle compare.

Usage: python3 tools/check.py <outDir> [sfDir] [query ...]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have produced
<outDir>/<name>.parquet plus <outDir>/oracle_sql.json. Runs each oracle
SQL in DuckDB over the sf parquet tables and compares rows/schema/values
(columns sorted by name, rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize for comparison: round floats, stringify everything
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    # Sort by non-float columns first so two floats straddling the
    # round(6) boundary cannot flip relative row order between the two
    # frames; floats participate only as a coarse (round-2) tie-break.
    non_float = [c for c in df.columns if df[c].dtype.kind != "f"]
    floats = [c for c in df.columns if df[c].dtype.kind == "f"]
    key_cols = non_float + floats

    def sort_key(s):
        if s.dtype.kind == "f":
            return s.round(2)
        return s.astype(str)

    df = df.sort_values(by=key_cols, ignore_index=True, key=sort_key)
    return df


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"{name}: MISSING spark result")
            n_bad += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(p) for p in spark_glob])
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            n_bad += 1
            continue
        rows_ok = len(sdf) == len(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        vals_ok = False
        if rows_ok and cols_ok:
            a, b = canon(sdf.copy()), canon(odf.copy())
            try:
                vals_ok = a.astype(str).equals(b.astype(str))
                if not vals_ok:
                    # tolerate float representation diffs
                    vals_ok = True
                    for c in a.columns:
                        if a[c].astype(str).equals(b[c].astype(str)):
                            continue
                        try:
                            fa = pd.to_numeric(a[c])
                            fb = pd.to_numeric(b[c])
                            if ((fa - fb).abs() < 1e-6).all():
                                continue
                        except Exception:
                            pass
                        vals_ok = False
                        diff = a[c].astype(str) != b[c].astype(str)
                        i = diff.idxmax()
                        print(f"  {name}.{c}: first diff row {i}: "
                              f"spark={a[c][i]!r} oracle={b[c][i]!r}")
            except Exception as e:
                print(f"  {name}: compare error {e}")
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            n_bad += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
