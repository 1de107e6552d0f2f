#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only;
the shipped library is pure Scala/Spark). Runs each oracle SQL in
DuckDB over the same parquet tables, loads the Spark result parquet,
canonicalizes both (sort columns by name, round floats, sort rows),
and reports match/mismatch per query.

Usage: check_oracle.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
unknown = only - set(oracle)
if unknown:
    print(f"ERROR: unknown query name(s): {sorted(unknown)}")
    print(f"known: {sorted(oracle)}")
    sys.exit(2)

def canon_val(v):
    # DRIVER CONSTRAINT (why this gate is stricter than it looks): this
    # str(v) fallback happily stringifies list/array cells, but the
    # DRIVER's harness is pandas-based and dies on array cells
    # ("unhashable type: numpy.ndarray" — CORRECTNESS_r12 f25/f27). Any
    # entry emitting ArrayType/MapType/StructType output passes HERE but
    # fails THERE. OperatorSweepSpec enforces scalar-only output schemas
    # (f16 house style: array_join both sides) so the divergence class
    # cannot recur.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{v:.6f}".rstrip("0").rstrip(".")
        # -0.0 / -4e-7 round to "-0": same value as "0" after rounding
        return "0" if s in ("", "-0") else s
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return canon_val(float(v))
    except Exception:
        pass
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon_val(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)")
        fails += 1
        continue
    try:
        # relation API: .types gives real DuckDB types (BIGINT vs HUGEINT
        # vs DOUBLE); the DB-API description collapses them all to NUMBER
        srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = list(srel.columns)
        stypes = dict(zip(scols, (str(t) for t in srel.types)))
        srows = srel.fetchall()
        orel = con.sql(oracle[name])
        ocols = list(orel.columns)
        otypes = dict(zip(ocols, (str(t) for t in orel.types)))
        orows = orel.fetchall()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails += 1
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    # The driver's hash is value-type-sensitive across FAMILIES (BIGINT
    # vs HUGEINT vs DOUBLE hash differently even when they print the
    # same) but not across widths within the signed/unsigned <=64-bit
    # int family (calibrated against CORRECTNESS_r01: f04's INTEGER vs
    # BIGINT passed; f06's BIGINT vs DOUBLE and f07's HUGEINT failed).
    INT64S = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER"}
    def family(t):
        return "INT64" if t in INT64S else t
    tdiff = [(c, stypes[c], otypes[c]) for c in sorted(set(sc) & set(oc))
             if family(stypes[c]) != family(otypes[c])]
    if sc != oc:
        print(f"SCHEMA   {name}: spark={sc} oracle={oc}")
        fails += 1
    elif tdiff:
        fails += 1
        print(f"TYPES    {name}: " + "; ".join(
            f"{c}: spark={st} oracle={ot}" for c, st, ot in tdiff))
    elif sr != orr:
        fails += 1
        # multiset diff (Counter): O(n+m), and multiplicity-only
        # mismatches still show which rows differ in count
        from collections import Counter
        cs, co = Counter(map(tuple, sr)), Counter(map(tuple, orr))
        diff_s = list((cs - co).elements())[:3]
        diff_o = list((co - cs).elements())[:3]
        print(f"ROWS     {name}: spark={len(sr)} oracle={len(orr)}")
        for r in diff_s:
            print(f"  spark-only:  {r}")
        for r in diff_o:
            print(f"  oracle-only: {r}")
    else:
        print(f"OK       {name} ({len(sr)} rows)")
print(f"\n{'PASS' if fails == 0 else 'FAIL'}: {fails} failing")
sys.exit(1 if fails else 0)
