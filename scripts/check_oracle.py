#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names, and a hash of all values with
columns sorted by name (mirroring the documented driver behavior).
Rows are compared both order-sensitively and order-insensitively so we
can see which kind of mismatch we have while iterating.
"""
import sys, os, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_sig(df):
    """(n_rows, sorted_cols, ordered_hash, unordered_hash)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["|".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    import hashlib
    h_ord = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    h_uno = hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()[:16]
    return len(rows), cols, h_ord, h_uno, rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gn, gc, gho, ghu, grows = frame_sig(got)
        wn, wc, who, whu, wrows = frame_sig(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif gn != wn:
            print(f"FAIL {name}: rows {gn} != {wn}")
            n_fail += 1
        elif ghu != whu:
            print(f"FAIL {name}: value hash mismatch")
            sg, sw = set(grows), set(wrows)
            for r in list(sg - sw)[:3]:
                print(f"   spark-only: {r[:160]}")
            for r in list(sw - sg)[:3]:
                print(f"   oracle-only: {r[:160]}")
            n_fail += 1
        else:
            order = "ordered" if gho == who else "UNORDERED-ONLY"
            print(f"PASS {name} ({gn} rows, {order})")
            n_pass += 1
    # queries without oracle = rows-only check
    for name in sorted(os.listdir(out_dir)):
        if name not in oracle and os.path.isdir(f"{out_dir}/{name}"):
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
