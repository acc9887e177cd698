#!/usr/bin/env python3
"""Local self-check harness mirroring the driver's correctness gate:
runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same tables, compares sorted-by-column-name, sorted-rows
stringified values. Usage:
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt "runMain graft.Verify <sf> <out>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for robust comparison
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            out[c] = col.map(lambda v: canon_val(v))
        else:
            out[c] = col.map(canon_val)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def canon_val(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def lint_shapes(con, name, oracle_sql, parquet_files):
    """Pre-flight shape lint: the DRIVER's comparator (unlike canon() here,
    which stringifies) hashes typed values — DuckDB HUGEINT (any un-cast
    sum()-derived output) hashes differently from Spark bigint even when
    values are equal, and LIST/STRUCT cells crash its sort_values. This
    bug class cost rounds 1 (a13/f16b/f18) and 2 (x11/d7/e4); fail loudly
    here so it can't recur."""
    import pyarrow as pa
    problems = []
    try:
        for row in con.execute(f"DESCRIBE {oracle_sql}").fetchall():
            cname, ctype = row[0], row[1]
            t = ctype.upper()
            if "HUGEINT" in t:
                problems.append(f"oracle col {cname} is {ctype} (cast to BIGINT)")
            elif "[]" in t or t.startswith(("STRUCT", "MAP", "LIST")):
                problems.append(f"oracle col {cname} is {ctype} (serialize: array_to_string)")
    except Exception as e:
        problems.append(f"oracle DESCRIBE failed: {e}")
    for f in parquet_files[:1]:
        for field in pq.read_schema(f):
            if pa.types.is_nested(field.type):
                problems.append(
                    f"spark col {field.name} is {field.type} (serialize: array_join)")
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    # every declared query must have produced output — a query that threw
    # in Verify has no dir and must count as a failure, not shrink the
    # denominator
    manifest_path = os.path.join(out_dir, "queries.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            declared = json.load(f)
        present = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(d)}
        for name in declared:
            if name not in present:
                results[name] = "MISSING_OUTPUT (query threw in Verify)"
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})" if len(got) > 0 else "ROWS_ONLY_EMPTY"
            continue
        shape_problems = lint_shapes(con, name, oracles[name], files)
        if shape_problems:
            results[name] = "SHAPE_LINT " + "; ".join(shape_problems)
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            detail = []
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        detail.append(f"row{i}.{c}: spark={g.at[i, c]!r} duck={e.at[i, c]!r}")
            results[name] = "VALUE_MISMATCH " + "; ".join(detail[:6])
        else:
            results[name] = f"OK({len(g)})"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY("))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK', 'ROWS_ONLY(')) else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
