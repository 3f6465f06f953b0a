#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev loop only).

Usage: python3 tools/check.py <verify_outdir> <sf_dir>

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the raw test tables, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality (with a tiny float tolerance report so we can see *how* far off a
mismatch is).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr — bit-level compare for doubles
    return repr(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchall()
            sp_cols = [d[0] for d in con.description]
            du = con.execute(sql).fetchall()
            du_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # the driver's pandas comparator CRASHES on list-typed cells
        # (unhashable numpy.ndarray, round-2 lesson) — our repr() canon
        # would mask that, so fail loudly instead. Scan EVERY row: a NULL
        # in row 0 of an array column would otherwise slip through.
        complex_cols = set()
        for row in sp:
            for c, v in zip(sp_cols, row):
                if isinstance(v, (list, tuple, dict)):
                    complex_cols.add(c)
        complex_cells = sorted(complex_cols)
        if complex_cells:
            print(f"FAIL {name}: complex-typed columns {complex_cells} — "
                  "driver checker cannot hash these; flatten with concat_ws")
            n_fail += 1
            continue
        sc, sr = canon(sp, sp_cols)
        dc, dr = canon(du, du_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
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
