#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf_dir
parquet tables, and compares: row count, column names, and a hash of all
values after sorting columns by name and rows by all columns (mirrors the
driver's described compare). Prints one line per query + a summary.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    # The driver's r1 results show the hash tolerates int width (int32 vs
    # int64) and last-ulp float noise, but not type-class changes (bigint vs
    # hugeint->float64 failed q12 in r1). Mirror that: coerce ints to int64,
    # format floats with %.9g, hash everything else by repr.
    import hashlib
    import numbers

    import numpy as np
    h = hashlib.md5()
    for col in df.columns:
        s = df[col]
        # Booleans hash as their own type class on BOTH sides: a bool-dtype
        # column on one side vs Python/numpy bools in an object column on
        # the other must agree (they coerced asymmetrically before — ADVICE
        # r3; np.bool_ is not a bool subclass NOR a numbers.Real, so it
        # must be matched explicitly here or it falls through to repr
        # hashing — ADVICE r4).
        vals = s.dropna()
        if pd.api.types.is_bool_dtype(s) or (
                s.dtype == object and len(vals)
                and vals.map(lambda v: isinstance(v, (bool, np.bool_))).all()):
            h.update(b"bool")
            for v in s.astype("boolean").tolist():
                h.update((b"\xffNULL" if v is pd.NA else str(v).encode())
                         + b"\x00")
            continue
        # An int column holding NULLs arrives as float64/object on one side
        # but int64 on the other (pandas nullability), which would hash with
        # different type prefixes and report a false FAIL — normalize such a
        # column to nullable Int64 first. The coercion is deliberately
        # NARROW: a NULL-free float64 column must hash as float even when
        # all values are integral, because the driver treats int64 vs
        # float64 as a type-class mismatch (its r1 q12 behavior; DuckDB
        # HUGEINT->float64 masked by this very coercion shipped the r6
        # q78/q89 regression — VERDICT r6). So float dtype only coerces
        # when NULLs are actually present (the pandas-nullability case);
        # object dtype (Python ints) always coerces. Only genuine
        # ints/floats coerce: strings/bytes must stay text ("04" vs "4"
        # distinct), bools are handled above, and Decimal must NOT
        # round-trip through float64 (precision loss beyond 2^53 could mint
        # a false PASS — ADVICE r3); Decimal is not a numbers.Real so the
        # isinstance guard excludes it. Every firing is loud so local green
        # with a WARN is never silently weaker than the driver.
        if not pd.api.types.is_integer_dtype(s) and (
                (pd.api.types.is_float_dtype(s) and s.isna().any())
                or s.dtype == object):
            try:
                coercible = vals.map(
                    lambda v: isinstance(v, numbers.Real)
                    and not isinstance(v, (bool, np.bool_))).all()
                coerced = pd.to_numeric(s, errors="coerce")
                if coercible and coerced.notna().equals(s.notna()) and \
                        coerced.dropna().astype(float).map(float.is_integer).all():
                    print(f"     WARN col '{col}': coerced {s.dtype} -> "
                          f"Int64 (nullable-int normalization); driver may "
                          f"hash this column differently", file=sys.stderr)
                    s = coerced.astype("Int64")
            except (TypeError, ValueError):
                pass
        # NUL separator after every value: without it, adjacent values can
        # concatenate identically for different data ([1,111] vs [11,11])
        # and the gate would print a false PASS.
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
            h.update(b"int")
            for v in s.tolist():
                # NULL hashes explicitly, distinct from any real value
                h.update((b"\xffNULL" if v is pd.NA else str(v).encode()) + b"\x00")
        elif pd.api.types.is_float_dtype(s):
            h.update(b"float")
            for v in s.tolist():
                h.update((f"{v:.9g}").encode() + b"\x00")
        else:
            h.update(repr(s.dtype).encode())
            for v in s.tolist():
                h.update(repr(v).encode() + b"\x00")
    return h.hexdigest()


def main(out_dir: str, sf_dir: str, only: str = "") -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:  # declared oracle-less entries (name -> reason): report, not FAIL
        declared = json.load(open(f"{out_dir}/no_oracle.json"))
    except FileNotFoundError:
        declared = {}
    if only:  # local iteration filter, mirrors Verify's SPARK_GRAFT_ONLY
        keep = {q.strip() for q in only.split(",")}
        oracle = {k: v for k, v in oracle.items() if k in keep}
        declared = {k: v for k, v in declared.items() if k in keep}
    for name, reason in sorted(declared.items()):
        try:
            rows = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"decl {name}: declared no_oracle, rows={rows} ({reason})")
        except Exception as e:
            print(f"decl {name}: declared no_oracle, NO SPARK RESULT ({e})")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        s, o = norm(spark_df), norm(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hmatch = rows and schema and value_hash(s) == value_hash(o)
        status = "ok  " if (rows and schema and hmatch) else "FAIL"
        if status == "FAIL":
            n_bad += 1
        print(f"{status} {name}: rows={rows}({len(s)}/{len(o)}) "
              f"schema={schema} hash={hmatch}")
        if not schema:
            print(f"     spark cols: {list(s.columns)}")
            print(f"     oracle cols: {list(o.columns)}")
        if rows and schema and not hmatch:
            for col in s.columns:
                if not s[col].equals(o[col]):
                    diff = (s[col] != o[col])
                    print(f"     col '{col}' differs "
                          f"(dtype {s[col].dtype} vs {o[col].dtype}, "
                          f"{int(diff.sum())} rows); first: "
                          f"{s[col][diff].head(2).tolist()} vs "
                          f"{o[col][diff].head(2).tolist()}")
    print(f"SUMMARY: {len(oracle) - n_bad}/{len(oracle)} green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))
