#!/usr/bin/env python3
"""Type-aware local replica of the driver's DuckDB oracle compare.

Usage:
  sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Compares each Spark parquet result against the DuckDB oracle SQL with
TYPE sensitivity: a DuckDB HUGEINT (int128) column vs a Spark BIGINT
column is a FAIL even when every value is equal, because the driver's
canonicalization hashes typed values. (The round-1 replica str()-coerced
values and missed exactly this class — 9 silent failures.)

Canonicalization mirror of the driver:
  - columns sorted by name
  - rows sorted by the full tuple
  - values hashed with their arrow type name attached for integers
    (int64 vs decimal/int128 must differ), floats rounded to 9 dp.
"""
import json
import math
import sys

import duckdb
import pyarrow as pa


def canon_value(v, typ: pa.DataType):
    if v is None:
        return ("null",)
    if pa.types.is_floating(typ):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("f", round(f, 9))
    if pa.types.is_integer(typ):
        # width-insensitive (driver accepted int32 vs int64 in round 1)
        return ("i", int(v))
    if pa.types.is_decimal(typ):
        # DuckDB HUGEINT exports as decimal128(38,0) — must NOT equal int
        return ("dec", str(v))
    if pa.types.is_boolean(typ):
        return ("b", bool(v))
    return ("s", str(v))


def canon_table(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    types = [tbl.schema.field(c).type for c in cols]
    rows = []
    pydata = [tbl.column(i).to_pylist() for i in range(len(cols))]
    for r in range(tbl.num_rows):
        rows.append(tuple(canon_value(pydata[i][r], types[i]) for i in range(len(cols))))
    rows.sort(key=repr)

    def tname(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        return str(t)

    schema = [(c, tname(t)) for c, t in zip(cols, types)]
    return schema, rows


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        # a missing/unreadable table (e.g. a scale dir without
        # embeddings.parquet) must only fail the queries that use it,
        # not abort the whole checker
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:  # noqa: BLE001
            print(f"WARN no view for table {t}: {e}")
    # Targeted Verify runs (SPARK_GRAFT_QUERIES set) write
    # oracle_sql_partial.json so they can't clobber the canonical full
    # dump; prefer the partial file when it's the newer artifact.
    import os
    full, part = f"{out_dir}/oracle_sql.json", f"{out_dir}/oracle_sql_partial.json"
    if os.path.exists(part) and (
            not os.path.exists(full)
            or os.path.getmtime(part) > os.path.getmtime(full)):
        print(f"NOTE using {os.path.basename(part)} (targeted run)")
        oracle = json.load(open(part))
    else:
        oracle = json.load(open(full))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            spark_tbl = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow()
            ora_tbl = con.execute(oracle[name]).arrow()
            s_schema, s_rows = canon_table(spark_tbl)
            o_schema, o_rows = canon_table(ora_tbl)
            problems = []
            if [c for c, _ in s_schema] != [c for c, _ in o_schema]:
                problems.append(f"columns {s_schema} vs {o_schema}")
            elif s_schema != o_schema:
                diff = [(a, b) for a, b in zip(s_schema, o_schema) if a != b]
                problems.append(f"TYPES differ: {diff}")
            if len(s_rows) != len(o_rows):
                problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
            elif s_rows != o_rows:
                bad = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
                problems.append(f"values differ in {bad}/{len(s_rows)} rows; "
                                f"first: {next((a, b) for a, b in zip(s_rows, o_rows) if a != b)}")
            if problems:
                n_fail += 1
                print(f"FAIL {name}: {'; '.join(problems)[:400]}")
            else:
                n_pass += 1
                print(f"ok   {name} ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERR  {name}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: check_oracle.py SF_DIR VERIFY_OUT_DIR\n"
              "  e.g. python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out")
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
