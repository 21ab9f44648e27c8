"""Local simulation of the driver's correctness gate."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def to_table(res):
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        tabs = ray.get(res.to_arrow_refs())
        tabs = [t for t in tabs if t.num_rows] or tabs[:1]
        if not tabs:
            # zero blocks entirely: an empty result with whatever
            # schema the plan still knows (None -> no columns)
            sch = res.schema()
            return (sch.base_schema.empty_table() if sch is not None
                    else pa.table({}))
        return pa.concat_tables(tabs)
    raise TypeError(type(res))

def canon(tab: pa.Table) -> pd.DataFrame:
    df = tab.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[1:] or None
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        mine = canon(to_table(fn(SF)))
    except Exception as ex:
        print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
        fails.append(name)
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"OK?  {name}: rows-only, {len(mine)} rows, {dt:.1f}s, cols={list(mine.columns)}")
        continue
    theirs = canon(pa.Table.from_pandas(con.execute(oracles[name]).fetchdf(),
                                        preserve_index=False))
    ok_rows = len(mine) == len(theirs)
    ok_cols = list(mine.columns) == list(theirs.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            # Driver-strength compare: the driver hashes the sorted values
            # exactly, so a dtype difference (engine int64 vs DuckDB
            # HUGEINT->float64) fails its hash even when every cell matches.
            # Mirror that: exact dtype everywhere, exact values for
            # non-float columns, tight tolerance for floats.
            pd.testing.assert_frame_equal(
                mine, theirs, check_dtype=True, check_exact=False,
                rtol=1e-12, atol=1e-12)
            for c in mine.columns:
                if not pd.api.types.is_float_dtype(mine[c]):
                    pd.testing.assert_series_equal(
                        mine[c], theirs[c], check_dtype=True,
                        check_exact=True)
            ok_vals = True
        except AssertionError as ex:
            msg = str(ex).split("\n")[0:4]
    status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
    if status == "FAIL":
        fails.append(name)
    print(f"{status} {name}: mine={len(mine)} oracle={len(theirs)} "
          f"cols_ok={ok_cols} vals_ok={ok_vals} {dt:.1f}s")
    if not ok_cols:
        print("   mine cols:", list(mine.columns), " oracle:", list(theirs.columns))
    if ok_rows and ok_cols and not ok_vals:
        print("   " + " | ".join(msg))
print("FAILURES:", fails if fails else "none")
ray.shutdown()
