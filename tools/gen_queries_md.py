#!/usr/bin/env python3
"""Regenerate QUERIES.md from the query packs' `all` / `oracles` maps."""
import re, glob, os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
packs = {}
oracle_keys = set()
for path in sorted(glob.glob(f"{root}/src/main/scala/graft/queries/*.scala")):
    pack = os.path.basename(path)[:-6]
    src = open(path).read()
    m = re.search(r"val all:.*?=\s*Map\((.*?)\n  \)", src, re.S)
    # every pack MUST yield queries and (except rows-only-only packs)
    # oracle entries — a silent regex miss would under-report coverage
    if not m:
        raise SystemExit(f"{pack}: `val all` Map not matched — fix the "
                         "regex or the pack's formatting")
    qs = re.findall(r'"(q\d+\w*_\w+)"\s*->', m.group(1))
    if not qs:
        raise SystemExit(f"{pack}: `val all` matched but contains no "
                         "query entries")
    for q in qs:
        if q in packs:
            raise SystemExit(f"{q}: duplicated across {packs[q]} and {pack}")
        packs[q] = pack
    mo = re.search(r"val oracles:.*?=\s*Map\((.*?)\n  \)\n", src, re.S)
    if not mo:
        raise SystemExit(f"{pack}: `val oracles` Map not matched")
    oracle_keys.update(re.findall(r'"(q\d+\w*_\w+)"\s*->', mo.group(1)))


def qnum(name):
    # "q251a_..." sorts between q251 and q252 (suffix letters are a
    # bench-ordering device); key = (number, letter suffix)
    head = name.split("_")[0][1:]
    digits = "".join(c for c in head if c.isdigit())
    return (int(digits), head[len(digits):])


rows = sorted(packs.items(), key=lambda kv: qnum(kv[0]))
n_oracle = sum(1 for q, _ in rows if q in oracle_keys)
out = [
    "# QUERIES — the full named-query catalog",
    "",
    "Every entry in `SparkEntry.queries`; \"oracle\" = hash-compared",
    "against the paired DuckDB SQL in `SparkEntry.oracleSql`,",
    "\"rows-only\" = non-SQL-expressible (MLE / engine-specific hashes /",
    "approximate structures), covered by ScalaTest instead.",
    "See each query pack's Scaladoc for the SURVEY §2 operator ids.",
    "",
    f"{len(rows)} queries: {n_oracle} oracle, {len(rows) - n_oracle} rows-only.",
    "",
    "| query | pack | check |",
    "|---|---|---|",
]
for q, pack in rows:
    check = "oracle" if q in oracle_keys else "rows-only"
    out.append(f"| {q} | {pack} | {check} |")
open(f"{root}/QUERIES.md", "w").write("\n".join(out) + "\n")
print(f"{len(rows)} queries, {n_oracle} oracle")
