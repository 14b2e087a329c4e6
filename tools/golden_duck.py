#!/usr/bin/env python3
"""Cross-check golden .test files against DuckDB.

Usage: golden_duck.py <sfDir> <file.test> [...]

For each block whose QUERY is portable SQL (no dialect-only functions, no
row_regex / CATCH expectations), runs the query in DuckDB over the same
parquet tables and compares the rendered rows with the block's RESULTS.
Blocks it cannot run are reported as SKIP — those rest on the reference's
own expected values (constant-expression conformance) or engine pins.

Rendering matches graft.GoldenRunner.render: strings single-quoted, NULL
literal, timestamps 'YYYY-MM-DD HH:MM:SS[.9f]', booleans true/false,
doubles via repr-ish minimal form (Scala Double.toString differs for
large/small magnitudes — blocks compared here should avoid raw doubles or
use values where both agree).
"""
import sys, re, math, datetime, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DIALECT_ONLY = re.compile(
    r"\b(strleft|strright|zeroifnull|nullifzero|isfalse|istrue|isnotfalse|"
    r"isnottrue|nonnullvalue|nullvalue|quotient|is_inf|is_nan|rotateleft|"
    r"rotateright|getbit|setbit|countset|int_months_between|dayname|"
    r"monthname|timeofday|\w+_add|\w+_sub|adddate|subdate|fnv_hash|ndv|"
    r"ndv_hll|group_concat|appx_median|histogram|sample|distinctpc|"
    r"distinctpcsa|regexp_match_count|simhash|minhash64|token_hashes|"
    r"shingle_hashes|trunc|extract|date_part|now)\s*\(", re.I)


def render_val(v, impala=False):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            base += f".{v.microsecond * 1000:09d}"
        return base
    if isinstance(v, datetime.date):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            # impala_render drops the trailing .0 (C++ ostream style);
            # default matches Scala's whole-double rendering
            return str(int(v)) if impala else f"{int(v)}.0"
        r = repr(v)
        return r
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def parse_blocks(path):
    text = open(path).read()
    out = []
    for block in [b.strip() for b in text.split("====") if b.strip()]:
        sections = re.split(r"----\s*", block)
        q, results, opts, catch = "", [], "", None
        for s in sections:
            s = s.strip()
            if not s:
                continue
            head, _, body = s.partition("\n")
            if head.strip() == "QUERY":
                if any("duck:skip" in l for l in body.splitlines()
                       if l.strip().startswith("#")):
                    q = "__DUCK_SKIP__"
                    continue
                q = "\n".join(l for l in body.splitlines()
                              if not l.strip().startswith("#")).strip()
            elif head.strip() == "RESULTS":
                results = [l.strip() for l in body.splitlines() if l.strip()]
            elif head.strip() == "OPTIONS":
                opts = body
            elif head.strip() == "CATCH":
                catch = body
        out.append((q, results, opts, catch))
    return out


def main():
    sfdir = sys.argv[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    total_ok = total_fail = total_skip = 0
    for path in sys.argv[2:]:
        for i, (q, results, opts, catch) in enumerate(parse_blocks(path), 1):
            tag = f"{path.split('/')[-1]}#{i}"
            if catch is not None or any(r.startswith("row_regex") for r in results):
                total_skip += 1
                continue
            # '# duck:skip' comment: documented engine-vs-duckdb dialect
            # divergence (e.g. float->int cast rounding, concat NULLs)
            if q == "__DUCK_SKIP__":
                total_skip += 1
                print(f"SKIP {tag} (marked duck:skip)")
                continue
            if DIALECT_ONLY.search(q):
                total_skip += 1
                print(f"SKIP {tag} (dialect)")
                continue
            # DDL/DML blocks: execute for session state (views/tables used
            # by later SELECT blocks) but don't compare — DuckDB returns an
            # affected-row count for INSERT where the engine returns no rows
            if re.match(r"(?is)^\s*(create|drop|insert)\b", q):
                try:
                    con.execute(q)
                    print(f"SKIP {tag} (ddl/dml executed)")
                except Exception as e:
                    print(f"SKIP {tag} (ddl failed: {str(e).splitlines()[0][:80]})")
                total_skip += 1
                continue
            try:
                rows = con.execute(q).fetchall()
            except Exception as e:
                total_skip += 1
                print(f"SKIP {tag} (duckdb: {str(e).splitlines()[0][:90]})")
                continue
            impala = "impala_render" in opts
            got = [",".join(render_val(v, impala) for v in r) for r in rows]
            want = list(results)
            if "order_sensitive" not in opts:
                got, want = sorted(got), sorted(want)
            if got != want:
                total_fail += 1
                diffs = [(a, b) for a, b in zip(got, want) if a != b][:3]
                print(f"FAIL {tag}: {len(got)} vs {len(want)} rows; " +
                      "; ".join(f"got={a} want={b}" for a, b in diffs))
            else:
                total_ok += 1
    print(f"== {total_ok} ok, {total_fail} fail, {total_skip} skip")
    sys.exit(1 if total_fail else 0)


if __name__ == "__main__":
    main()
