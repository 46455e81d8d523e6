"""Simulate the driver's correctness gate for the CURRENT scoring
window: virgin SparkSession, foreign cwd, first 50 registry queries vs
their DuckDB oracles at sf0.01, value-level compare after column-name
sort (the driver hashes; exact equality is strictly stronger, modulo
the astype(str) artifacts CLAUDE.md lists: -0.0 vs 0.0 and DATE repr
— a FAIL here needs a value-level look before being believed).

Run from any cwd: python tools/sim_driver_window.py
Pre-round checklist: run this after any registry/ledger edit — it is
the closest local approximation of CORRECTNESS_r{N}.json."""
import importlib.util, json, sys, traceback

import duckdb

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from auraverse_etl_pipeline_spark.plans.registry import all_queries

qs, osql = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

window = list(all_queries())[:50]
bad = []
for name in window:
    try:
        s = qs[name](spark, "/root/testdata/sf0.01").toPandas()
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(s)} rows", flush=True)
            continue
        o = con.execute(osql[name]).fetchdf()[list(s.columns)]
        s2 = s.sort_values(list(s.columns)).reset_index(drop=True).astype(str)
        o2 = o.sort_values(list(s.columns)).reset_index(drop=True).astype(str)
        ok = len(s) == len(o) and s2.equals(o2)
        print(f"{'OK   ' if ok else 'FAIL '}{name}: {len(s)}/{len(o)}", flush=True)
        if not ok:
            bad.append(name)
    except Exception as exc:
        print(f"ERROR {name}: {exc}", flush=True)
        traceback.print_exc()
        bad.append(name)
print("SUMMARY bad:", bad)
