#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result, runs the matching
oracle_sql.json SQL in DuckDB over <sfDir>'s tables, sorts columns by
name, and hash-compares values. Mirrors the driver contract described in
the builder prompt (rows / schema / hash per query).
"""
import json
import sys

import duckdb


def canon(con, rel_sql, label):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical textual form, row order preserved
    body = df.to_csv(index=False, float_format="%.10g")
    import hashlib
    return len(df), list(df.columns), [str(t) for t in df.dtypes], hashlib.sha256(body.encode()).hexdigest(), df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    skipped = 0
    for name, sql in sorted(oracle.items()):
        # Verify always writes the FULL oracle manifest (so a targeted
        # re-dump can't clobber it down to a subset); a targeted outDir
        # then simply lacks most result dirs — skip those, don't fail
        if not os.path.isdir(os.path.join(out_dir, name)):
            skipped += 1
            continue
        try:
            n1, c1, t1, h1, d1 = canon(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')", "spark")
            n2, c2, t2, h2, d2 = canon(con, sql, "oracle")
            # t1 == t2 matters: the driver hashes TYPED values, while the
            # CSV normalization here collapses e.g. HUGEINT 1 vs BIGINT 1 —
            # without the dtype check this script says OK where the driver
            # says hash-FAIL (seen on session_assign in round 1).
            ok = (n1 == n2) and (c1 == c2) and (t1 == t2) and (h1 == h2)
            status = "OK  " if ok else "FAIL"
            if not ok:
                failures += 1
            print(f"{status} {name}: rows {n1}/{n2} cols {'=' if c1 == c2 else f'{c1} vs {c2}'} "
                  f"types {'=' if t1 == t2 else f'{t1} vs {t2}'} hash {'=' if h1 == h2 else 'DIFF'}")
            if not ok and n1 == n2 and c1 == c2 and n1 > 0:
                import pandas as pd
                neq = (d1.astype(str).values != d2.astype(str).values).any(axis=1)
                print("  first diffs (spark vs oracle):")
                print("  ", d1[neq].head(3).to_dict("records"))
                print("  ", d2[neq].head(3).to_dict("records"))
        except Exception as e:
            failures += 1
            print(f"ERR  {name}: {e}")
    # queries without oracle → rows-only
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} (no oracle)")
    if skipped:
        print(f"SKIP {skipped} oracle entries without a result dir (targeted run)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
