#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the sf tables, and
compares row count, schema (column names) and a hash of values with columns
sorted by name. Usage: compare.py <sfDir> <outDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    # row order as returned (queries are totally ordered on both sides)
    for r in rows:
        h.update(("\x01".join(canon(r[i]) for i in order)).encode())
        h.update(b"\x02")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output dir")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{spath}/*.parquet')")
        gcols, grows = [d[0] for d in got.description], got.fetchall()
        try:
            exp = con.sql(sql)
            ecols, erows = [d[0] for d in exp.description], exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        problems = []
        if len(grows) != len(erows):
            problems.append(f"rows {len(grows)} != {len(erows)}")
        if sorted(gcols) != sorted(ecols):
            problems.append(f"cols {sorted(gcols)} != {sorted(ecols)}")
        if not problems and frame_hash(gcols, grows) != frame_hash(ecols, erows):
            problems.append("value hash mismatch")
            # show first differing row for debugging
            go = sorted(range(len(gcols)), key=lambda i: gcols[i])
            eo = sorted(range(len(ecols)), key=lambda i: ecols[i])
            for i, (gr, er) in enumerate(zip(grows, erows)):
                gv = [canon(gr[j]) for j in go]
                ev = [canon(er[j]) for j in eo]
                if gv != ev:
                    problems.append(f"first diff row {i}:\n  spark={gv}\n  duck ={ev}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("  " + p)
            failures += 1
        else:
            print(f"OK   {name}: {len(grows)} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
