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
round 6). Each query's DuckDB result types (DESCRIBE <oracle sql>)
are compared column-for-column against DuckDB's reading of the Spark
parquet schema; any mismatch is a ✗ even if the values compare equal.
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
    """Column-name → DuckDB type string for `query` (planning only).

    Limitation: the dtype gate compares DESCRIBE of the oracle SQL against
    DuckDB's reading of the Spark parquet output, so it only catches type
    gaps DuckDB's parquet reader preserves. Distinctions it erases (e.g.
    TIMESTAMP_NTZ vs TIMESTAMP, parquet logical-type nuances) could still
    diverge in the driver's typed hash — a good approximation, not a
    guarantee. An exact check would compare a Spark-declared schema dump
    (schema.json next to each result) instead."""
    return {r[0]: r[1] for r in con.sql(f"DESCRIBE {query}").fetchall()}

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
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
            stypes = duck_types(con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            dtypes = duck_types(con, oracle[name])
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
