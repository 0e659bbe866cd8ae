#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

NOT part of the Scala library — dev tooling only (driver-side python).
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir, runs oracle_sql.json[name]
in DuckDB over the sfDir tables and compares:
  - schema: column names (sorted)
  - rows: values in produced order, columns sorted by name
Floats compared exactly first; on mismatch reports max abs diff.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


# Columns DuckDB widens past 64 bits hash-mismatch Spark's BIGINT even
# when every value is equal (q78 round 3, q111 round 4). DESCRIBE each
# oracle and refuse any 128-bit output column up front.
BANNED_TYPES = ("HUGEINT", "UHUGEINT")


def lint_types(con, oracle):
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report, don't crash the lint
            bad.append((name, "?", f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in desc:
            if any(b in str(typ).upper() for b in BANNED_TYPES):
                bad.append((name, col, typ))
    for name, col, typ in bad:
        print(f"LINT {name}: column {col!r} is {typ} — wrap with "
              f"CAST(... AS BIGINT) so DuckDB's hash matches Spark's")
    return len(bad)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = lint_types(con, oracle)
    n_pass = n_skip = 0
    import os
    produced = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in produced:
        if name not in oracle:
            print(f"  SKIP {name}: no oracle (rows-only check)")
            n_skip += 1
            continue
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        exp_rel = con.sql(oracle[name])
        got_cols = sorted(got_rel.columns)
        exp_cols = sorted(exp_rel.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != oracle {exp_cols}")
            n_fail += 1
            continue
        g_idx = [got_rel.columns.index(c) for c in got_cols]
        e_idx = [exp_rel.columns.index(c) for c in exp_cols]
        got = [[norm(r[i]) for i in g_idx] for r in got_rel.fetchall()]
        exp = [[norm(r[i]) for i in e_idx] for r in exp_rel.fetchall()]
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows != oracle {len(exp)}")
            n_fail += 1
            continue
        bad = None
        maxdiff = 0.0
        for i, (gr, er) in enumerate(zip(got, exp)):
            for gv, ev in zip(gr, er):
                if gv == ev:
                    continue
                if isinstance(gv, float) and isinstance(ev, float):
                    if math.isnan(gv) and math.isnan(ev):
                        continue
                    d = abs(gv - ev)
                    maxdiff = max(maxdiff, d)
                    if d > 0:
                        bad = bad or (i, gv, ev)
                else:
                    bad = bad or (i, gv, ev)
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}: got {bad[1]!r} "
                  f"exp {bad[2]!r} (max float diff {maxdiff:g})")
            n_fail += 1
        else:
            print(f"  ok  {name} ({len(got)} rows)")
            n_pass += 1
    missing = sorted(set(oracle) - set(produced))
    for m in missing:
        print(f"FAIL {m}: oracle declared but no result parquet produced")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
