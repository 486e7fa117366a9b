#!/usr/bin/env python3
"""Local correctness harness: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet directory written by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB over the fixture tables,
canonicalizes both sides (columns sorted by name, rows sorted, values
stringified with doubles repr'd), and reports PASS/FAIL per query.
"""
import json, os, sys, math
import duckdb

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    def s(v):
        if v is None:
            return "NULL"
        # Do NOT collapse 746.0 -> "746": the driver's hash distinguishes a
        # float column from an integer one (DuckDB HUGEINT/DOUBLE widening is
        # exactly the class of oracle bug this harness must catch locally).
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)
    rows = sorted(tuple(s(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    tables = ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    npass = nfail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            nfail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            nfail += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
            nfail += 1
        elif gr != wr:
            print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows")
            for i, (a, b) in enumerate(zip(gr, wr)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                print(f"  row count mismatch; spark[:2]={gr[:2]} oracle[:2]={wr[:2]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
