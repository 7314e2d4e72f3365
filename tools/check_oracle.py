#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: loads our parquet result, runs the oracle SQL in DuckDB
against views named after the test tables, and compares schema (column
names sorted), row count, and values (columns sorted by name, rows sorted,
exact equality). This mirrors the described driver behavior so oracle
drift is caught before the round gate runs.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

LIMIT_2_53 = 1 << 53

def overflow_2_53(rows):
    """Values outside the driver hash's float64-exact integer domain.

    The r8 red rows (q_pass_at_k, q_factorized_regression) were value-
    exact but emitted integers above 2^53; the driver's hash
    canonicalization is not exact there, so rows_match/schema_match
    held while hash_match failed. Any such value must ship as a digit
    string instead (see HashDomainSweepSpec for the type-level half).
    """
    import decimal
    bad = []
    for row in rows:
        for v in row:
            if isinstance(v, bool):
                continue
            if isinstance(v, (int, decimal.Decimal)) and abs(v) > LIMIT_2_53:
                bad.append(v)
    return bad

def canon(rows):
    # Floats carry their IEEE sign bit explicitly: the driver's hash
    # distinguishes -0.0 from 0.0 (Python == does not), which hid the
    # r6 q_whitening_2d signed-zero mismatch from this local replica.
    out = []
    for row in rows:
        out.append(tuple(
            ("f", "nan") if isinstance(v, float) and math.isnan(v) else
            ("f", math.copysign(1.0, v), round(v, 9))
            if isinstance(v, float) else
            ("v", str(v)) for v in row))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            # con.execute() returns the connection/cursor itself, so
            # .description must be captured before the next execute()
            exp = con.execute(sql)
            exp_desc = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_desc = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            bad += 1
            continue
        exp_cols, got_cols = sorted(exp_desc), sorted(got_desc)
        if exp_cols != got_cols:
            print(f"FAIL {name}: cols {got_cols} != oracle {exp_cols}")
            bad += 1
            continue
        # reorder both to sorted-column order
        eidx = [i for i, _ in sorted(enumerate(exp_desc), key=lambda p: p[1])]
        exp2 = canon([[r[i] for i in eidx] for r in exp_rows])
        gidx = [i for i, _ in sorted(enumerate(got_desc), key=lambda p: p[1])]
        got2 = canon([[r[i] for i in gidx] for r in got_rows])
        over = overflow_2_53(got_rows)
        if over:
            print(f"FAIL {name}: {len(over)} values above 2^53 "
                  f"(driver-hash domain), e.g. {over[0]} — emit as string")
            bad += 1
            continue
        if len(exp2) != len(got2):
            print(f"FAIL {name}: rows {len(got2)} != oracle {len(exp2)}")
            bad += 1
        elif exp2 != got2:
            diffs = [i for i, (a, b) in enumerate(zip(exp2, got2)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first at {diffs[0]}:")
            print(f"  oracle: {exp2[diffs[0]]}")
            print(f"  got   : {got2[diffs[0]]}")
            bad += 1
        else:
            print(f"ok   {name} ({len(got2)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} failed")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
