#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, and compares
against the Spark result parquet in <verifyOutDir>/<name>/.

Comparison: sort columns by name, sort rows by all columns, exact value
equality (floats compared bit-exactly, with max-abs-diff reported on
mismatch so near-misses are visible).
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
            orc_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(orc_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if [str(t) for t in s.dtypes] != [str(t) for t in o.dtypes]:
            # The driver hashes *renderings*, so an int64-vs-HUGEINT
            # (pandas float64) divergence fails its gate even when every
            # value is equal. Any dtype mismatch where neither side is a
            # float is therefore a hard FAIL here too; float-vs-float
            # width drift stays a WARN (values still compared below).
            mismatched = [
                (c, str(s.dtypes.iloc[i]), str(o.dtypes.iloc[i]))
                for i, c in enumerate(s.columns)
                if str(s.dtypes.iloc[i]) != str(o.dtypes.iloc[i])]
            hard = [m for m in mismatched
                    if not (m[1].startswith("float")
                            and m[2].startswith("float"))]
            if hard:
                print(f"FAIL {name}: dtype mismatch (driver hashes "
                      f"renderings): {hard}")
                n_fail += 1
                continue
            print(f"WARN {name}: float-width dtypes spark="
                  f"{list(map(str, s.dtypes))} oracle="
                  f"{list(map(str, o.dtypes))}")
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv, ov = s[c], o[c]
            try:
                eq = (sv == ov) | (sv.isna() & ov.isna())
            except Exception:
                eq = sv.astype(str) == ov.astype(str)
            if not eq.all():
                detail = ""
                try:
                    diff = (sv - ov).abs().max()
                    detail = f" max_abs_diff={diff}"
                except Exception:
                    pass
                idx = (~eq).idxmax()
                detail += f" first: spark={sv[idx]!r} oracle={ov[idx]!r}"
                bad.append(f"{c}:{int((~eq).sum())} rows{detail}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"OK   {name} ({len(s)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail, "
          f"{len([q for q in oracle if not only or q in only])} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
