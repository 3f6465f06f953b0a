#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev loop only).

Usage: python3 tools/check.py <verify_outdir> <sf_dir> [key_substr]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the raw test tables, and
compares the two the way the DRIVER does: both sides materialized through
pandas `fetchdf()` (so DuckDB HUGEINT -> float64 and other dtype coercions
are VISIBLE, not masked), columns sorted by name, dtypes compared per
column, rows sorted, exact value equality. Round-4 lesson: a fetchall()
mirror passed two queries the driver failed because DuckDB sum(BIGINT)
returns HUGEINT which pandas fetches as float64 while Spark's parquet is
int64 — the dtype gate below fails on exactly that.
"""
import sys, json, glob, math, os
import numpy as np
import duckdb

# Above this many result rows the per-cell pandas repr compare below takes
# >10 min (the r13 sf10 spot-gate blocker: fn_datetime / stream_session_5m)
# — switch to an in-DuckDB multiset-hash compare. Both sides are rendered
# by the SAME DuckDB VARCHAR casts (shortest-roundtrip for doubles, so
# distinct values never collide and identical values never diverge), and
# the aggregate is order-independent (sum of per-row hashes + a second
# independent hash + min/max row), so the compare is exact in practice
# while never materializing the frame into Python.
FAST_ROWS = int(os.environ.get("GRAFT_CHECK_FAST_ROWS", "2000000"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    # pandas hands back numpy scalars; unwrap to python for stable repr
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr — bit-level compare for doubles
    return repr(v)

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

# Oracle result types that pandas fetchdf() coerces to a dtype Spark will
# never emit — hash-mismatch guaranteed even when every VALUE is identical.
# HUGEINT/UHUGEINT -> float64 (the r4 classify_quality/vocab_coverage bug);
# DECIMAL -> object/float64 (the r1 lesson, SURVEY §2.0 rule 6); unsigned
# ints have no Spark counterpart.
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UTINYINT",
                    "USMALLINT", "UINTEGER", "UBIGINT")

def lint_oracle_types(con, name, sql):
    """Static type lint: DESCRIBE binds the oracle's output schema without
    executing it, so a sum(BIGINT)->HUGEINT slip fails FAST with the column
    named, before any comparison runs (r4 VERDICT #6)."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return [f"describe error: {e}"]
    return [f"{col}: {typ} — cast the oracle expression "
            f"(e.g. CAST(... AS BIGINT/DOUBLE))"
            for col, typ, *_ in desc
            if any(t in typ.upper() for t in BAD_ORACLE_TYPES)]

def qident(c):
    return '"' + c.replace('"', '""') + '"'

def hash_compare(con, name, sql, files):
    """Order-independent exact compare for huge frames, entirely in DuckDB.

    Returns (ok, msg). Rows are canonicalized as chr(31)-joined VARCHAR
    casts of the name-sorted columns (NULL -> chr(30) sentinel so NULL and
    '' stay distinct); the multiset signature is (count, sum(hash(row)),
    sum(hash(row||salt)), min(row), max(row)). Two different multisets
    colliding on BOTH independent 64-bit hash sums AND the min/max rows is
    ~2^-128 — treated as exact for the gate's purposes."""
    def schema_of(src):
        # JSON ≡ VARCHAR: pandas fetches both as object, so the driver's
        # dtype gate passes them — the fast gate must not be stricter
        # (validated: fn_to_json was the one fast/pandas divergence at sf0.01)
        return {c: ("VARCHAR" if t == "JSON" else t)
                for c, t, *_ in con.execute(f"DESCRIBE {src}").fetchall()}
    sp_src = "SELECT * FROM read_parquet(main.list_value(" + ",".join(
        "'" + f.replace("'", "''") + "'" for f in files) + "))"
    sp_sch, du_sch = schema_of(f"({sp_src})"), schema_of(f"({sql})")
    if sorted(sp_sch) != sorted(du_sch):
        return False, (f"columns differ spark={sorted(sp_sch)} "
                       f"duck={sorted(du_sch)}")
    complex_cols = sorted(c for c, t in sp_sch.items()
                          if "[" in t or "STRUCT" in t or "MAP" in t)
    if complex_cols:
        return False, (f"complex-typed columns {complex_cols} — driver "
                       "checker cannot hash these; flatten with concat_ws")
    dt_bad = [(c, sp_sch[c], du_sch[c]) for c in sorted(sp_sch)
              if sp_sch[c] != du_sch[c]]
    if dt_bad:
        return False, ("dtypes differ (spark vs oracle): " + ", ".join(
            f"{c}: {a} vs {b}" for c, a, b in dt_bad))
    row = "concat_ws(chr(31)," + ",".join(
        f"coalesce(CAST({qident(c)} AS VARCHAR), chr(30))"
        for c in sorted(sp_sch)) + ")"
    sig = (f"SELECT count(*), sum(hash(r)::HUGEINT), "
           f"sum(hash(r || chr(29))::HUGEINT), min(r), max(r) "
           f"FROM (SELECT {row} AS r FROM %s)")
    sp_sig = con.execute(sig % f"({sp_src})").fetchone()
    du_sig = con.execute(sig % f"({sql})").fetchone()
    if sp_sig != du_sig:
        return False, (f"multiset signatures differ:\n  spark: {sp_sig}\n"
                       f"  duck : {du_sig}")
    return True, f"{sp_sig[0]} rows, hash mode"

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    key_filter = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is a single file; GenData (sf1 scale-stress) writes
        # Spark directories — glob the parts in that case
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if key_filter and key_filter not in name:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        lint = lint_oracle_types(con, name, sql)
        if lint:
            print(f"FAIL {name}: oracle type lint: " + "; ".join(lint))
            n_fail += 1
            continue
        try:
            sp_n = con.execute("SELECT count(*) FROM read_parquet(?)",
                               [files]).fetchone()[0]
            if sp_n > FAST_ROWS:
                ok, msg = hash_compare(con, name, sql, files)
                print(("PASS" if ok else "FAIL") + f" {name}" +
                      (f" ({msg})" if ok else f": {msg}"))
                n_pass += ok
                n_fail += not ok
                continue
            sp_df = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchdf()
            du_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # the driver's pandas comparator CRASHES on list-typed cells
        # (unhashable numpy.ndarray, round-2 lesson) — fail loudly instead.
        complex_cols = sorted(
            c for c in sp_df.columns
            if any(isinstance(v, (list, tuple, dict, np.ndarray))
                   for v in sp_df[c]))
        if complex_cols:
            print(f"FAIL {name}: complex-typed columns {complex_cols} — "
                  "driver checker cannot hash these; flatten with concat_ws")
            n_fail += 1
            continue
        sc, dc = sorted(sp_df.columns), sorted(du_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        # dtype gate — the driver hashes value BYTES per dtype, so an int64
        # Spark column vs a float64 oracle column hash-mismatches even when
        # every value is numerically identical (HUGEINT lesson).
        dt_bad = [(c, str(sp_df[c].dtype), str(du_df[c].dtype))
                  for c in sc if sp_df[c].dtype != du_df[c].dtype]
        if dt_bad:
            print(f"FAIL {name}: dtypes differ (spark vs oracle): " +
                  ", ".join(f"{c}: {a} vs {b}" for c, a, b in dt_bad) +
                  "  — cast the oracle expression (e.g. CAST(sum(..) AS BIGINT))")
            n_fail += 1
            continue
        _, sr = canon(sp_df)
        _, dr = canon(du_df)
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first at {i}:")
            print(f"  cols : {sc}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            # how far off: max abs delta over float-parseable mismatched cells
            deltas = []
            for _, ra, rb in bad:
                for va, vb in zip(ra, rb):
                    if va != vb:
                        try:
                            deltas.append(abs(float(va) - float(vb)))
                        except ValueError:
                            pass
            if deltas:
                print(f"  max abs float delta over mismatches: {max(deltas):.3e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
