#!/usr/bin/env python3
"""Dev-only validation loop mimicking the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark); this
script exists so builder iterations can catch Spark-vs-DuckDB drift
before the driver's per-round verify.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # match plausible driver float normalization: repr of float64
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}")
            n_fail += 1
            continue
        hg, he = frame_hash(got_rows, got_cols), frame_hash(exp_rows, exp_cols)
        if hg != he:
            print(f"FAIL {name}: hash mismatch ({len(got_rows)} rows)")
            # show first differing line for debugging
            order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            lg = sorted("|".join(norm_cell(r[i]) for i in order_g) for r in got_rows)
            le = sorted("|".join(norm_cell(r[i]) for i in order_e) for r in exp_rows)
            for a, b in zip(lg, le):
                if a != b:
                    print(f"  got: {a}\n  exp: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
