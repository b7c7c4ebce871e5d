#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers every fixture table from
<sfDir> as a DuckDB view under its bare name, runs each oracle SQL, and
compares against the Spark result parquet at <verifyOutDir>/<name>/ —
columns sorted by name, rows sorted by all columns, exact value match
(floats must already be rounded inside the queries themselves).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # normalize -0.0 and NaN representation
                if math.isnan(v): v = "NaN"
                elif v == 0.0: v = 0.0
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            sres = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # declared-type alignment: the driver's hash is representation-
        # sensitive (round-1 lesson: DECIMAL output columns and DuckDB's
        # sum(BIGINT)->HUGEINT promotion fail it even when values match),
        # so a type mismatch is a hard local failure
        try:
            ot = {d[0]: d[1] for d in con.execute(f"DESCRIBE {sql}").fetchall()}
            st = {d[0]: d[1] for d in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
            tdiff = {k: (ot.get(k), st.get(k)) for k in set(ot) | set(st)
                     if ot.get(k) != st.get(k)}
        except Exception:
            tdiff = {}
        if tdiff:
            print(f"FAIL {name}: declared-type mismatch {tdiff}")
            n_fail += 1
            continue
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
            n_fail += 1
        elif len(orr) != len(srr):
            print(f"FAIL {name}: rowcount oracle={len(orr)} spark={len(srr)}")
            n_fail += 1
        elif orr != srr:
            diffs = [(a, b) for a, b in zip(orr, srr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
