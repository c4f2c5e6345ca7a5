#!/usr/bin/env python3
"""Cross-run determinism audit: compare two graft.Verify output dirs
(the SAME engine run twice) key by key with the driver's normalization.
Catches nondeterministic output the DuckDB compare can't see — exempt
(hash-based) keys included, since they must still be stable run-to-run.
Usage:
    python3 tools/stability.py /tmp/out_run1 /tmp/out_run2
"""
import sys, os, glob, hashlib
import duckdb


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(con, path):
    rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = rel.columns
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return len(rows), h.hexdigest()


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # union of both runs' keys: taking run 1's listing alone would
    # silently ignore a key that only run 2 produced (e.g. run 1
    # crashed mid-write) instead of reporting the asymmetry
    def listing(d):
        return {os.path.basename(p) for p in glob.glob(os.path.join(d, "*"))
                if os.path.isdir(p)}
    keys = sorted(listing(a_dir) | listing(b_dir))
    n_pass = n_fail = 0
    for k in keys:
        b = os.path.join(b_dir, k)
        if not os.path.isdir(os.path.join(a_dir, k)):
            print(f"MISS {k}: absent from run 1")
            n_fail += 1
            continue
        if not os.path.isdir(b):
            print(f"MISS {k}: absent from run 2")
            n_fail += 1
            continue
        (na, ha) = table_hash(con, os.path.join(a_dir, k))
        (nb, hb) = table_hash(con, b)
        if na == nb and ha == hb:
            n_pass += 1
        else:
            n_fail += 1
            print(f"UNSTABLE {k}: run1 {na} rows {ha[:12]}, run2 {nb} rows {hb[:12]}")
    print(f"== {n_pass} stable, {n_fail} unstable ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
