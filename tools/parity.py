#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result) + <out>/oracle_sql.json,
runs each oracle in DuckDB with the sfDir tables registered as views,
and compares: columns sorted by name, rows sorted, exact values.
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); bad += 1; continue
        try:
            srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols, srows = canon(srel.fetchall(), [c for c in srel.columns])
            stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
            orel = con.sql(sql)
            ocols, orows = canon(orel.fetchall(), [c for c in orel.columns])
            otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
        except Exception as e:
            print(f"FAIL {name}: {e}"); bad += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); bad += 1; continue
        # The driver's hasher is TYPE-sensitive: DuckDB SUM(BIGINT)→HUGEINT vs
        # Spark BIGINT hash-mismatches even when values print identically.
        # Compare declared types so that class of bug fails locally too.
        tdiffs = [(c, stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]]
        if tdiffs:
            print(f"FAIL {name}: type mismatch " +
                  ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in tdiffs))
            bad += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); bad += 1
            continue
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} row diffs; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)"); ok += 1
    print(f"\n{ok} ok, {bad} fail")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
