#!/usr/bin/env python3
"""Find reference QueryTest blocks not yet ported into the local golden
corpus.

Usage: port_gap.py <reference-file.test> [--show]

Matches by normalized query text (whitespace/case folded, comments
stripped, functional/functional_parquet db prefixes dropped). Ported
blocks may be adapted (aliasing, NULLS LAST, operand swaps), so fuzzy
fallback: a reference block counts as ported if any local block tagged
`# ref:<same file>` shares >=0.8 token-set overlap.
"""
import sys, re, glob, os

REF_DIR = "/root/reference/testdata/workloads/functional-query/queries/QueryTest"
LOCAL = "src/test/resources/golden"


def blocks(path):
    text = open(path, encoding="utf-8", errors="replace").read()
    out = []
    for raw in text.split("===="):
        raw = raw.strip()
        if not raw:
            continue
        m = re.search(r"----\s*QUERY\s*\n(.*?)(?:\n----|\Z)", raw, re.S)
        if not m:
            continue
        q = "\n".join(l for l in m.group(1).splitlines()
                      if not l.strip().startswith("#")).strip()
        if q:
            out.append((q, raw))
    return out


def norm(q):
    q = q.lower()
    q = re.sub(r"\b(functional_parquet|functional|tpch_nested_parquet|tpch_parquet|tpch)\.", "", q)
    q = re.sub(r"\s+", " ", q)
    return q.strip().rstrip(";")


def toks(q):
    return set(re.findall(r"[a-z_0-9.]+", norm(q)))


def main():
    ref_file = sys.argv[1]
    show = "--show" in sys.argv
    base = os.path.basename(ref_file)
    ref_path = ref_file if os.path.exists(ref_file) else os.path.join(REF_DIR, base)

    local_qs = []
    for lf in glob.glob(os.path.join(LOCAL, "*.test")):
        text = open(lf, encoding="utf-8").read()
        for raw in text.split("===="):
            if f"ref:{base}" not in raw:
                continue
            m = re.search(r"----\s*QUERY\s*\n(.*?)(?:\n----|\Z)", raw, re.S)
            if m:
                q = "\n".join(l for l in m.group(1).splitlines()
                              if not l.strip().startswith("#")).strip()
                local_qs.append(q)
    local_norm = {norm(q) for q in local_qs}
    local_toks = [toks(q) for q in local_qs]

    missing = []
    for q, raw in blocks(ref_path):
        n = norm(q)
        if n in local_norm:
            continue
        t = toks(q)
        best = max((len(t & lt) / max(1, len(t | lt)) for lt in local_toks),
                   default=0.0)
        if best >= 0.8:
            continue
        missing.append((q, raw, best))

    print(f"{base}: {len(blocks(ref_path))} ref blocks, "
          f"{len(local_qs)} ported, {len(missing)} missing")
    for q, raw, best in missing:
        head = q.splitlines()[0][:100]
        print(f"  [{best:.2f}] {head}")
        if show:
            print("-" * 70)
            print(raw)
            print("=" * 70)


if __name__ == "__main__":
    main()
