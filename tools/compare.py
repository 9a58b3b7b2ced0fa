#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]

For each query with an oracle: register the sf parquet tables in DuckDB, run
the oracle SQL, load the Spark result parquet, sort columns by name and rows
by value, and compare.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def typestr(t):
    # Parquet round-trips Spark timestamps as TIMESTAMP WITH TIME ZONE in
    # DuckDB while plain SQL emits TIMESTAMP; the driver's hash treats them
    # alike, so normalize tz-ness only. Everything else is strict — this is
    # what catches DuckDB widening sum(BIGINT) to HUGEINT.
    return str(t).replace(" WITH TIME ZONE", "")

def typemap(rel):
    return {c: typestr(t) for c, t in zip(rel.columns, rel.types)}

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(round(v, 6) if isinstance(v, float) else v
                         for v in (r[i] for i in order)))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not spark_files:
            print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
        srel = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
        sdf, scols, stypes = srel.fetchall(), srel.columns, typemap(srel)
        try:
            orel = con.sql(sql)
            odf, ocols, otypes = orel.fetchall(), orel.columns, typemap(orel)
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
        a, b = canon(sdf, scols), canon(odf, ocols)
        tdiff = {c: (stypes.get(c), otypes.get(c))
                 for c in set(scols) & set(ocols)
                 if stypes.get(c) != otypes.get(c)}
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
            fail += 1
        elif tdiff:
            print(f"{name}: TYPE MISMATCH {tdiff}")
            fail += 1
        elif a == b:
            print(f"{name}: OK ({len(a)} rows)"); ok += 1
        else:
            print(f"{name}: MISMATCH spark={len(a)} oracle={len(b)} rows")
            sa, sb = set(a), set(b)
            for d in list(sa - sb)[:3]: print(f"  spark-only: {d}")
            for d in list(sb - sa)[:3]: print(f"  oracle-only: {d}")
            fail += 1
    print(f"\n{ok} OK, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main())
