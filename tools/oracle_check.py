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

# --- round(x, 6) magnitude lint (SCALE_r8 rule, automated) ------------------
# round(x, 6) is engine-stable only while the scaled value needs <= ~15.95
# significant digits, i.e. |x| below ~1e9; past that Spark (scaled BigDecimal
# from the unscaled double) and DuckDB (multiply-by-1e6-first) can disagree by
# one scale-6 ulp on bit-identical doubles. Monetary TOTALS grow linearly with
# the scale factor, so the driver-gate sf cannot see the hazard — project each
# double column's magnitude to sf=1 and flag any column that is rounded FINER
# than scale 2 (scale-2 values stay stable to ~1e13) yet can plausibly cross
# the limit. A flagged column must round at scale 2 (FIXTURES magnitude rule).
LINT_TARGET_SF = 1.0
LINT_LIMIT = 1e9

def round6_magnitude_lint(con, d, cur_sf, oracle_sql):
    import re
    factor = LINT_TARGET_SF / cur_sf if cur_sf and cur_sf < LINT_TARGET_SF else 1.0
    # the hazard is engines ROUNDING independently: only columns the oracle
    # itself renders via round(..., 6) are in the class (a raw passthrough
    # double, e.g. an epoch-ms timestamp, hashes identically unrounded)
    cols = [r[0] for r in
            con.execute(f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
            if r[1].upper() == "DOUBLE"
            and re.search(r',\s*6\s*\)\s+AS\s+"?' + re.escape(r[0]) + r'"?\b',
                          oracle_sql, re.IGNORECASE)]
    flagged = []
    for c in cols:
        # "finer than scale 2" via DECIMAL(38,6) cast: float remainder tests
        # false-positive at |x| ≳ 1e9 where double representation error of a
        # genuine scale-2 value exceeds any fixed epsilon, while the decimal
        # cast reads back exactly the 6 digits round(x, 6) semantics carry
        mx, fine = con.execute(
            f"SELECT max(abs(\"{c}\")), "
            f"  bool_or(CAST(\"{c}\" AS DECIMAL(38,6)) % CAST(0.01 AS DECIMAL(38,6)) <> 0) "
            f"FROM read_parquet('{d}/*.parquet') "
            f"WHERE abs(\"{c}\") < 1e20 AND isfinite(\"{c}\")").fetchone()
        if mx is not None and fine and mx * factor >= LINT_LIMIT:
            flagged.append((c, mx, mx * factor))
    return flagged

def lint_selftest():
    """The lint must reject an intentionally-unsafe result: a scale-6-rounded
    total whose sf1 projection crosses 1e9 — and pass its scale-2 twin."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as td:
        bad = os.path.join(td, "bad"); os.makedirs(bad)
        con.execute(
            f"COPY (SELECT CAST(43415658.123456 AS DOUBLE) AS total, "
            f"  CAST(0.5 AS DOUBLE) AS ratio) "
            f"TO '{bad}/r.parquet' (FORMAT parquet)")
        sql = 'SELECT round(t, 6) AS total, round(r, 6) AS ratio FROM x'
        got = round6_magnitude_lint(con, bad, 0.01, sql)
        assert [f[0] for f in got] == ["total"], got
        # a passthrough column (not round(...,6) in the oracle) is exempt
        assert round6_magnitude_lint(
            con, bad, 0.01, 'SELECT total, ratio FROM x') == []
        good = os.path.join(td, "good"); os.makedirs(good)
        con.execute(
            f"COPY (SELECT CAST(43415658.12 AS DOUBLE) AS total, "
            f"  CAST(0.5 AS DOUBLE) AS ratio) "
            f"TO '{good}/r.parquet' (FORMAT parquet)")
        assert round6_magnitude_lint(con, good, 0.01, sql) == []
    print("lint selftest ok: unsafe scale-6 total rejected, scale-2 twin passes")

def sf_of(sf_dir):
    import re
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1).rstrip(".")) if m else None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # 10x-rehearsal knobs: the recursive-CTE components fixpoint at sf1
    # needs a spill directory and a generous memory ceiling (SCALE_r8).
    # The spill dir now DEFAULTS on: the r11 sf1 sweep ran 120+ oracles on
    # one connection with no temp_directory and the allocator eventually
    # failed on a 1 KB block — without a spill path DuckDB aborts instead
    # of spilling, and a long sweep accumulates until exactly that.
    import tempfile
    tmp = os.environ.get("GRAFT_DUCKDB_TMP") or tempfile.mkdtemp(prefix="graft_duck_")
    con.execute(f"SET temp_directory='{tmp}'")
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    cur_sf = sf_of(sf_dir)
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if cur_sf is not None and name in oracles:
            lint = round6_magnitude_lint(con, d, cur_sf, oracles[name])
            if lint:
                print(f"[FAIL] {name}: round6-magnitude lint: "
                      + ", ".join(f"{c} max|x|={m:.4g} -> sf1~{p:.4g}"
                                  for c, m, p in lint)
                      + " (round monetary totals at scale 2 — FIXTURES rule)")
                n_fail += 1
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
    if sys.argv[1:] == ["--lint-selftest"]:
        lint_selftest()
        sys.exit(0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
