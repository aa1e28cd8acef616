#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: load the Spark parquet result, run the
oracle SQL in DuckDB (tables registered as views over the same sfDir),
sort columns by name, sort rows, and compare values exactly (with a
float tolerance report so rounding gaps are visible before the driver
sees them).

Also dtype-STRICT: the driver's compare hashes typed values, so a
DuckDB HUGEINT next to a Spark BIGINT fails there even when every
value is equal — and pandas equality erases exactly that gap (q12,
round 6). Each query's SPARK-DECLARED schema (spark_schemas.json,
emitted by graft.Verify — authoritative, immune to what DuckDB's
parquet reader preserves or erases) is canonicalized to DuckDB type
names and compared column-for-column against DESCRIBE <oracle sql>;
any mismatch is a ✗ even if the values compare equal. Falls back to
DuckDB's reading of the Spark parquet schema when the declared dump
is absent (older verify outputs).
"""
import duckdb, json, math, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "tolist"):  # numpy arrays
        return tuple(norm(x) for x in v.tolist())
    return v

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b

def duck_types(con, query):
    """Column-name → DuckDB type string for `query` (planning only)."""
    return {r[0]: r[1] for r in con.sql(f"DESCRIBE {query}").fetchall()}

def canon_spark(t):
    """Spark SQL type string → canonical DuckDB-comparable type name.

    Handles every type the board emits; an unmapped type returns itself
    uppercased so a new type shows up as a loud mismatch, never a silent
    pass. TIMESTAMP and TIMESTAMP_NTZ both canonicalize to TIMESTAMP:
    the session runs in UTC and DuckDB's TIMESTAMP is naive, so the
    driver's value hash sees identical instants either way."""
    t = t.strip().upper()
    if t.startswith("ARRAY<") and t.endswith(">"):
        return canon_spark(t[6:-1]) + "[]"
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return {
        "INT": "INTEGER", "SMALLINT": "SMALLINT", "TINYINT": "TINYINT",
        "STRING": "VARCHAR", "TIMESTAMP_NTZ": "TIMESTAMP",
        "FLOAT": "FLOAT", "REAL": "FLOAT",
    }.get(t, t)

def canon_duck(t):
    """DuckDB DESCRIBE type string → the same canonical space."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return canon_duck(t[:-2]) + "[]"
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return {"TIMESTAMP WITH TIME ZONE": "TIMESTAMP"}.get(t, t)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    schema_path = os.path.join(outdir, "spark_schemas.json")
    declared = json.load(open(schema_path)) if os.path.exists(schema_path) else {}
    spark_dirs = sorted(d for d in os.listdir(outdir)
                        if os.path.isdir(os.path.join(outdir, d)))
    n_ok = n_bad = 0
    for name in spark_dirs:
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
            print(f"  {name:28s} NO-ORACLE rows={n}")
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name:28s} ERROR {e}")
            n_bad += 1
            continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"✗ {name:28s} COLS spark={scols} duck={dcols}")
            n_bad += 1
            continue
        try:
            if name in declared:
                stypes = {c: canon_spark(t) for c, t in declared[name].items()}
            else:  # fallback: DuckDB's reading of the Spark parquet output
                stypes = {c: canon_duck(t) for c, t in duck_types(
                    con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").items()}
            dtypes = {c: canon_duck(t) for c, t in duck_types(con, oracle[name]).items()}
            mism = [(c, stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]]
        except Exception as e:
            print(f"✗ {name:28s} DTYPE-CHECK ERROR {e}")
            n_bad += 1
            continue
        if mism:
            detail = ", ".join(f"{c}: spark={st} duck={dt}" for c, st, dt in mism)
            print(f"✗ {name:28s} DTYPE {detail}")
            n_bad += 1
            continue
        sdf, ddf = sdf[scols], ddf[dcols]
        if len(sdf) != len(ddf):
            print(f"✗ {name:28s} ROWS spark={len(sdf)} duck={len(ddf)}")
            n_bad += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)]
        drows = [tuple(norm(v) for v in r) for r in ddf.itertuples(index=False)]
        exact = srows == drows
        if exact:
            print(f"✓ {name:28s} OK rows={len(srows)}")
            n_ok += 1
            continue
        # find first diff; check tolerance
        tol_ok = all(close(a, b) for a, b in zip(srows, drows))
        if tol_ok:
            print(f"~ {name:28s} FLOAT-ONLY diff (driver may fail hash!) rows={len(srows)}")
            n_bad += 1
        else:
            for i, (a, b) in enumerate(zip(srows, drows)):
                if not close(a, b):
                    print(f"✗ {name:28s} VALUE row {i}:")
                    print(f"    spark: {a}")
                    print(f"    duck : {b}")
                    break
            n_bad += 1
    # dtype visibility for schema-compare risk
    print(f"\n{n_ok} ok, {n_bad} bad, {len(spark_dirs) - n_ok - n_bad} no-oracle")
    return n_bad

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
