#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (<out>/<name>/*.parquet) run the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sort columns by name, sort rows, and compare.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # driver rounds; queries pre-round — normalize -0.0 and ulp noise
                    vals.append(f"{v + 0.0:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": "no spark result"}
            n_bad += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table()
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": str(e)[:300]}
            n_bad += 1
            continue
        ocols = sorted(odf.column_names)
        scols = sorted(sdf.column_names)
        if ocols != scols:
            print(f"SCHEMA   {name}: spark={scols} oracle={ocols}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": sdf.num_rows,
                             "oracle_rows": odf.num_rows, "err": None}
            n_bad += 1
            continue
        # Dtype-FAMILY mismatches break the driver's value hash even when
        # stringified values agree (round 1: DuckDB sum(int) -> DECIMAL(38,0)
        # vs Spark LongType). int32/int64 width differences are tolerated.
        def family(t):
            t = str(t)
            if t.startswith("decimal"):
                return "decimal"
            if t.startswith(("int", "uint")):
                return "int"
            if t in ("float", "double") or t.startswith("float"):
                return "float"
            return t
        fam_bad = [c for c in ocols
                   if family(odf.schema.field(c).type) != family(sdf.schema.field(c).type)]
        if fam_bad:
            det = {c: (str(sdf.schema.field(c).type), str(odf.schema.field(c).type))
                   for c in fam_bad}
            print(f"DTYPE    {name}: spark-vs-oracle {det}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": sdf.num_rows,
                             "oracle_rows": odf.num_rows, "err": None}
            n_bad += 1
            continue
        orows = canon(odf.select(ocols).to_pandas().itertuples(index=False, name=None))
        srows = canon(sdf.select(scols).to_pandas().itertuples(index=False, name=None))
        results[name] = {"rows_match": len(orows) == len(srows),
                         "schema_match": True,
                         "hash_match": orows == srows,
                         "spark_rows": len(srows),
                         "oracle_rows": len(orows), "err": None}
        if len(orows) != len(srows):
            print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
        elif orows != srows:
            diff = sum(1 for a, b in zip(orows, srows) if a != b)
            print(f"VALUES   {name}: {diff}/{len(orows)} rows differ")
            for a, b in list(zip(orows, srows))[:2000]:
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}")
                    break
            n_bad += 1
        else:
            print(f"OK       {name}: {len(srows)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(results.items())), f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    # optional 3rd arg: write a CORRECTNESS_r{N}-style per-query JSON
    # artifact (the committed sf0.1 scale-verification record:
    #   sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout01"
    #   python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/vout01 CORRECTNESS_sf01.json
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
