#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables, and
compares values exactly (columns sorted by name, rows in produced order).
"""
import json, sys, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, ok, declared = [], 0, 0
for name in sorted(glob.glob(f"{outdir}/*/")):
    qname = name.rstrip("/").split("/")[-1]
    files = sorted(glob.glob(f"{name}/part-*.parquet") or glob.glob(f"{name}/*.parquet"))
    if not files:
        fails.append((qname, "NO SPARK OUTPUT"))
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if qname not in oracle:
        declared += 1
        print(f"  declared-only {qname}: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[qname]).fetchdf()
    except Exception as e:
        fails.append((qname, f"ORACLE SQL ERROR: {e}"))
        continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((qname, f"COLUMNS spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    # strict dtype-family check: ANY kind mismatch fails (int-vs-float,
    # bool-vs-int, datetime-vs-object, ...) except string-ish object kinds,
    # where pandas representation is not informative and the value compare
    # decides. A kind mismatch can break a hash-based compare on the driver
    # side even when Python == would pass (e.g. True == 1).
    kind_bad = None
    for c in s.columns:
        ks, kd = s[c].dtype.kind, d[c].dtype.kind
        if ks != kd and not ({ks, kd} <= {"O", "S", "U"}):
            kind_bad = f"DTYPE {c}: spark={s[c].dtype} duck={d[c].dtype}"
            break
    if kind_bad:
        fails.append((qname, kind_bad))
        continue
    if len(s) != len(d):
        fails.append((qname, f"ROWS spark={len(s)} duck={len(d)}"))
        continue
    bad = None
    for c in s.columns:
        sv, dv = list(s[c]), list(d[c])
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq = (a == b)
            try:
                if isinstance(a, float) and isinstance(b, float):
                    # BIT-exact, like the driver's parquet hash: Python ==
                    # says -0.0 == 0.0, which hid r7's llm_random_projection
                    # signed-zero divergence from this local gate.
                    import struct
                    eq = (struct.pack("<d", a) == struct.pack("<d", b)) or \
                        (math.isnan(a) and math.isnan(b))
            except Exception:
                pass
            if a is None and b is None:
                eq = True
            try:
                import pandas as pd
                if pd.isna(a) and pd.isna(b):
                    eq = True
            except (ValueError, TypeError):
                pass
            if not (eq is True or (hasattr(eq, "all") and eq.all())):
                bad = f"COL {c} row {i}: spark={a!r} duck={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((qname, bad))
    else:
        ok += 1
print(f"\n== {ok} match, {declared} declared-only, {len(fails)} FAIL ==")
for q, why in fails:
    print(f"FAIL {q}: {why}")
sys.exit(1 if fails else 0)
