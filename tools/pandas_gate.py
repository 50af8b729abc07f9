#!/usr/bin/env python3
"""Driver-comparator replica for the failure modes check.py can't see:
the driver loads each query's parquet into pandas and sort_values over
every column — array/ndarray cells and exotic arrow types (hugeint ->
object Decimal) break or hash-mismatch there. Run after graft.Verify.

Usage: python3 tools/pandas_gate.py [verifyOut]
"""
import datetime
import sys
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")

bad = 0
for qdir in sorted(p for p in OUT.iterdir() if p.is_dir()):
    try:
        df = pq.read_table(qdir).to_pandas()
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        # driver hashes repr-level values: flag object cells that aren't
        # plain python scalars (Decimal from hugeint, ndarray, dict)
        weird = set()
        for c in df.columns:
            if df[c].dtype == object:
                # scan the whole column (nulls dropped to keep it cheap):
                # a head-only sample misses non-scalar cells that sort to
                # the tail, e.g. a mostly-null column with late values
                for v in df[c].dropna():
                    if v is not None and not isinstance(
                            v, (str, bytes, bool, int, float,
                                datetime.date, datetime.datetime)):
                        weird.add((c, type(v).__name__))
        if weird:
            print(f"!! {qdir.name}: suspicious cell types {sorted(weird)}")
            bad += 1
        else:
            print(f"ok {qdir.name}: {len(df)} rows")
    except Exception as e:
        print(f"XX {qdir.name}: {type(e).__name__}: {e}")
        bad += 1
sys.exit(1 if bad else 0)
