#!/usr/bin/env python3
"""Dev-only validation loop mimicking the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark); this
script exists so builder iterations can catch Spark-vs-DuckDB drift
before the driver's per-round verify.

Both the Spark result and the DuckDB oracle are materialized through
DuckDB's pandas/Arrow path (`.df()`), NOT `fetchall()`: the driver's
normalizer evidently goes through Arrow, where DuckDB HUGEINT (the
type of `sum(int)`) renders as float64 ("2.0") while Spark's BIGINT
renders as int64 ("2").  `fetchall()` hides that difference behind
Python's unified `int`, which made local green fail to predict driver
green in round 9 (ev_ab_test / op_quality_audit).  Routing both sides
through `.df()` reproduces the driver's behavior.

Additionally every oracle in oracle_sql.json is linted via
`DESCRIBE (sql)`: any projected column whose DuckDB type Spark cannot
write as-is (HUGEINT, UHUGEINT, DECIMAL, unsigned ints) is a FAIL even
if values happen to match, because the dtype path makes such columns a
coin-flip on the driver.  Cast them (usually `CAST(x AS BIGINT)`) in
the oracle's final projection.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, hashlib
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB types Spark never emits from parquet; their pandas dtype
# differs from the Spark side even when values are equal.
NON_PORTABLE = ("HUGEINT", "UHUGEINT", "DECIMAL", "UTINYINT",
                "USMALLINT", "UINTEGER", "UBIGINT")


def norm_cell(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # match plausible driver float normalization: repr of float64
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return str([x.item() if isinstance(x, np.generic) else x for x in v])
    return str(v)


def fetch_df(cursor):
    """Materialize a DuckDB result the way the driver does: via pandas."""
    df = cursor.df()
    cols = list(df.columns)
    rows = list(df.itertuples(index=False, name=None))
    return cols, rows


def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def lint_types(con, name, sql):
    """FAIL on oracle output columns whose DuckDB type is non-portable."""
    try:
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    except Exception:
        return []  # the main loop will surface the real SQL error
    bad = []
    for col_name, col_type, *_ in desc:
        t = col_type.upper()
        if any(t.startswith(p) for p in NON_PORTABLE):
            bad.append(f"{col_name}:{col_type}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_lint = 0
    # Lint EVERY oracle in the dump (Verify writes all of oracle_sql
    # even for a partial run) so a bad type is caught the round it is
    # authored, not the round its query happens to be re-verified.
    for name, sql in sorted(oracle.items()):
        bad = lint_types(con, name, sql)
        if bad:
            print(f"LINT {name}: non-portable oracle types {bad} "
                  f"(cast in the final projection, e.g. CAST(x AS BIGINT))")
            n_lint += 1
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # partial Verify run; lint above still covered it
        try:
            cg = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_rows = fetch_df(cg)
            exp_cols, exp_rows = fetch_df(con.execute(sql))
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
    print(f"\n{n_pass} pass, {n_fail} fail, {n_lint} lint")
    return 1 if (n_fail or n_lint) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
