#!/usr/bin/env python3
"""Post-step for GenScale: re-type events.ts from INT64 (raw nanos, the only
form Spark can write) back to parquet TIMESTAMP(NANOS), matching the driver
tier's physical schema so both the Spark nanosAsLong reader and the DuckDB
oracle see identical data."""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-local/sf1.0/events.parquet"
t = pq.read_table(path)
if not pa.types.is_int64(t.schema.field("ts").type):
    print(f"ts already {t.schema.field('ts').type}; nothing to do")
    sys.exit(0)
i = t.schema.get_field_index("ts")
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
import shutil, os
if os.path.isdir(path):
    shutil.rmtree(path)
pq.write_table(t, path)
print(f"rewrote {path}: ts -> timestamp[ns], {t.num_rows} rows")
