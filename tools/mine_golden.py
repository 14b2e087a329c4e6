#!/usr/bin/env python3
"""Mine not-yet-ported blocks from a reference QueryTest file into a
staging golden file.

- Normalizes queries (comments/whitespace/case, functional.* prefixes)
  and skips any block whose query is already ported somewhere under
  src/test/resources/golden (by `# ref:` provenance convention or not).
- Prepends the fixture DDL blocks (alltypes family + complextypestbl)
  extracted from the existing reference-*.test files so the staging file
  runs standalone through graft.tools.GoldenCheck.

Usage: mine_golden.py <out.test> <reference-file.test> [more.test ...]
"""
import re, sys, glob, os

REF = "/root/reference/testdata/workloads/functional-query/queries/QueryTest"
GOLDEN = "src/test/resources/golden"

def blocks(text):
    return [b.strip() for b in text.split("====") if b.strip()]

def query_of(block):
    m = re.split(r"^---- ", block, flags=re.M)
    for s in m:
        if s.startswith("QUERY"):
            return s[len("QUERY"):].strip()
    return None

def norm(q):
    q = re.sub(r"(?m)^\s*#.*$", "", q)
    q = re.sub(r"(?m)^\s*--.*$", "", q)
    q = re.sub(r"\bfunctional(_parquet|_avro|_seq\w*)?\.", "", q, flags=re.I)
    q = re.sub(r"\s+", " ", q).strip().lower().rstrip(";")
    return q

def mined_set():
    s = set()
    for path in glob.glob(f"{GOLDEN}/*.test"):
        for b in blocks(open(path).read()):
            q = query_of(b)
            if q:
                s.add(norm(q))
    return s

def fixture_ddl():
    """Fixture DDL blocks from existing golden files, deduped by view."""
    out, seen = [], set()
    for path in sorted(glob.glob(f"{GOLDEN}/reference-*.test")):
        for b in blocks(open(path).read()):
            q = query_of(b)
            if not q:
                continue
            ql = norm(q)
            m = re.match(r"create or replace temporary view (\w+)", ql)
            if m and m.group(1) not in seen:
                seen.add(m.group(1))
                out.append(b)
            elif ql.startswith("cache table"):
                t = ql.split()[-1]
                if t in seen and ("cache:" + t) not in seen:
                    seen.add("cache:" + t)
                    out.append(b)
    return out

def main():
    out_path, files = sys.argv[1], sys.argv[2:]
    mined = mined_set()
    out = fixture_ddl()
    kept = skipped_mined = skipped_unfit = 0
    for fn in files:
        for b in blocks(open(f"{REF}/{fn}").read()):
            q = query_of(b)
            if not q:
                continue
            nq = norm(q)
            if nq in mined:
                skipped_mined += 1
                continue
            ql = nq
            if ql.startswith(("set ", "insert", "create", "drop", "compute",
                              "invalidate", "refresh", "use ", "explain",
                              "show", "describe", "alter", "load")):
                skipped_unfit += 1
                continue
            mined.add(nq)
            # strip db prefixes the staging session doesn't model
            b = re.sub(r"\bfunctional(_parquet|_avro|_seq\w*)?\.", "", b)
            b = b.replace("---- QUERY", f"---- QUERY\n# ref:{fn}", 1)
            if "impala_render" not in b:
                if "---- OPTIONS" in b:
                    b = b.replace("---- OPTIONS", "---- OPTIONS\nimpala_render", 1)
                else:
                    b = b.replace("---- RESULTS", "---- OPTIONS\nimpala_render\n---- RESULTS", 1)
            out.append(b)
            kept += 1
    with open(out_path, "w") as f:
        f.write("====\n" + "\n====\n".join(out) + "\n====\n")
    print(f"kept {kept}, already-ported {skipped_mined}, unfit {skipped_unfit} -> {out_path}")

if __name__ == "__main__":
    main()
