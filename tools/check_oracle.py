import duckdb, json, sys, glob, os
out = sys.argv[1] if len(sys.argv)>1 else '/tmp/verify_out'
sf  = sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = duckdb.connect().execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        # driver-style: sort columns by name
        exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"{name}: COLUMN MISMATCH exp={list(exp.columns)} got={list(got.columns)}"); continue
        if len(exp) != len(got):
            print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}"); continue
        exp2 = exp.reset_index(drop=True); got2 = got.reset_index(drop=True)
        diff = (exp2.astype(str) != got2.astype(str))
        if diff.any().any():
            bad = diff.any(axis=1)
            print(f"{name}: VALUE MISMATCH rows={bad.sum()}")
            print("exp:", exp2[bad].head(3).to_dict('records'))
            print("got:", got2[bad].head(3).to_dict('records'))
        else:
            print(f"{name}: OK ({len(exp)} rows)")
    except Exception as e:
        print(f"{name}: ERROR {e}")
