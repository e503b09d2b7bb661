#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: read the Spark parquet result, run the
oracle SQL (oracle_sql.json) in DuckDB against the raw tables, sort columns
by name, sort rows, and compare values cell-by-cell. Reports per-query
match/mismatch. Queries without oracle SQL are reported rows-only.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

def canon(rows):
    out = []
    for r in rows:
        canon_r = []
        for v in r:
            if isinstance(v, float):
                canon_r.append(v)
            else:
                canon_r.append(v)
        out.append(tuple(canon_r))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        tbl = pq.read_table(files[0]) if files else None
        if name not in oracle:
            print(f"ROWSONLY {name}: {tbl.num_rows if tbl else 0} rows")
            rows_only += 1
            continue
        try:
            ores = con.sql(oracle[name])
            ocols = sorted(ores.columns)
            odata = ores.df()[ocols].values.tolist()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        scols = sorted(tbl.column_names)
        sdata = tbl.to_pandas()[scols].values.tolist()
        if scols != [c for c in ocols]:
            print(f"SCHEMA-MISMATCH {name}: spark={scols} oracle={ocols}")
            bad += 1
            continue
        a, b = canon(sdata), canon(odata)
        if a == b:
            print(f"OK {name}: {len(a)} rows")
            ok += 1
        else:
            print(f"MISMATCH {name}: spark {len(a)} rows vs oracle {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}: spark={x} oracle={y}")
                    break
            else:
                if len(a) != len(b):
                    sa, sb = set(map(str,a)), set(map(str,b))
                    only_a = list(sa - sb)[:2]; only_b = list(sb - sa)[:2]
                    print(f"  only-spark: {only_a}\n  only-oracle: {only_b}")
            bad += 1
    print(f"\nSUMMARY: {ok} ok, {bad} bad, {rows_only} rows-only")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
