#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views of
<sfDir>/*.parquet, sorts columns by name, and compares cell-by-cell.
Not part of the shipped library (the Scala code never depends on this).
"""
import sys, json, glob, os
import duckdb

def canon(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got_rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            # Type-parity sweep first: DuckDB silently widens integer sums
            # (windowed sum -> HUGEINT, count products, etc.) to types Spark
            # never emits, which the driver hashes as a mismatch even when
            # every value is identical (the q63_scd2 round-7 red row). Reject
            # any oracle whose result schema carries a width Spark can't
            # produce so the class can't recur.
            bad = [
                (r[0], r[1]) for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
                if r[1].upper() in ("HUGEINT", "UHUGEINT", "UTINYINT",
                                    "USMALLINT", "UINTEGER", "UBIGINT")]
            if bad:
                print(f"[FAIL] {name}: oracle type-parity: {bad} "
                      f"(cast to a Spark-representable type in the oracle SQL)")
                n_fail += 1
                continue
            exp_rel = con.execute(oracles[name])
            exp_cols = [c[0] for c in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[FAIL] {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
            ok = False
        elif len(got) != len(exp):
            print(f"[FAIL] {name}: rowcount {len(got)} vs {len(exp)}")
            ok = False
        else:
            for r, (g, e) in enumerate(zip(got, exp)):
                gs = [canon(g[i]) for i in gi]
                es = [canon(e[i]) for i in ei]
                if gs != es:
                    print(f"[FAIL] {name}: row {r}: {gs} vs {es}")
                    ok = False
                    break
        if ok:
            n_pass += 1
            print(f"[ok] {name}: {len(got)} rows")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
