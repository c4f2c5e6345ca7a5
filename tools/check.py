#!/usr/bin/env python3
"""Local self-check: compare graft.Verify parquet dumps against DuckDB
running SparkEntry.oracleSql on the same tables (mirrors the driver's t2
gate: sort columns by name, stringify, hash). Usage:
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [key ...]

Round-7 hardening (the round-6 lesson: this mirror was LOOSER than the
driver's comparator, so 8 HUGEINT-typed oracle columns shipped red):
  * floats normalize via repr() (full precision), not %.10g;
  * every oracle result is DESCRIBE'd — any HUGEINT/UHUGEINT output
    column is a hard FAIL regardless of value equality (DuckDB promotes
    SUM(BIGINT) to HUGEINT; the driver's Arrow-level normalizer
    distinguishes it from BIGINT even when str() doesn't);
  * the oracle's DuckDB column types are cross-checked against the
    Spark parquet dump's types THROUGH THE SAME DuckDB type system
    (read_parquet), so DOUBLE-vs-DECIMAL / INT-vs-BIGINT drift fails
    here before it fails at the driver.
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED_TYPES = ("HUGEINT", "UHUGEINT")

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def described_types(con, sql):
    """name -> DuckDB type string for a query's output columns."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        files = glob.glob(os.path.join(out_dir, key, "*.parquet"))
        if not files:
            print(f"FAIL {key}: no spark output")
            n_fail += 1
            continue
        try:
            otypes = described_types(con, oracle[key])
        except Exception as e:
            print(f"FAIL {key}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        banned = {c: t for c, t in otypes.items()
                  if any(b in t.upper() for b in BANNED_TYPES)}
        if banned:
            print(f"FAIL {key}: oracle emits banned types {banned} "
                  f"(CAST the aggregate back to BIGINT)")
            n_fail += 1
            continue
        sparq = "read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        stypes = described_types(con, f"SELECT * FROM {sparq}")
        if stypes != otypes:
            drift = {c: (stypes.get(c), otypes.get(c))
                     for c in set(stypes) | set(otypes)
                     if stypes.get(c) != otypes.get(c)}
            print(f"FAIL {key}: column type drift (spark, oracle): {drift}")
            n_fail += 1
            continue
        try:
            odf = con.execute(oracle[key])
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(f"SELECT * FROM {sparq}")
        scols = [d[0] for d in sdf.description]
        srows = sdf.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {key}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {key}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if table_hash(srows, scols) != table_hash(orows, ocols):
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
            bad = 0
            for i, (sr, orow) in enumerate(zip(srows, orows)):
                sv = ["%s=%s" % (scols[j], norm(sr[j])) for j in so]
                ov = ["%s=%s" % (ocols[j], norm(orow[j])) for j in oo]
                if sv != ov:
                    print(f"FAIL {key} row {i}:\n  spark : {sv}\n  oracle: {ov}")
                    bad += 1
                    if bad >= 3:
                        break
            n_fail += 1
            continue
        print(f"PASS {key} ({len(srows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
