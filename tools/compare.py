#!/usr/bin/env python3
"""Local dev replica of the driver's t2 gate: run graft.Verify output vs
DuckDB oracles and report per-query row/schema/TYPE/value match.

The driver's hash is TYPE-sensitive (round-9 lesson: DuckDB sum(BIGINT)
widens to HUGEINT -> DECIMAL(38,0) arrow output, which hash-mismatches a
Spark BIGINT even when every value is identical). So this gate compares
arrow column types BEFORE values and fails on any mismatch -- local green
must imply driver green. The old tolerant value path survives only as a
diagnostic tag.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [keyFilter...]
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t):
    """Canonical arrow type string: collapse representation-only variants
    (large_string vs string, large_list vs list) but keep width and
    decimal-ness strict -- those are what the driver's hash keys on."""
    s = str(t)
    s = s.replace("large_string", "string").replace("string_view", "string")
    s = s.replace("large_list", "list")
    return s


def type_mismatches(sdf, odf, cols):
    bad = []
    for c in cols:
        st = canon_type(sdf.schema.field(c).type)
        ot = canon_type(odf.schema.field(c).type)
        if st != ot:
            bad.append((c, st, ot))
    return bad


def norm(v):
    """Value normalization for the DIAGNOSTIC tolerant pass only. The
    strict pass compares raw python values (Decimal stays Decimal)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "timestamp") and not isinstance(v, str):  # datetime
        return str(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def cells_equal_tolerant(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            cells_equal_tolerant(x, y) for x, y in zip(a, b))
    return a == b


def cells_equal_strict(a, b):
    """Driver-faithful equality: no Decimal->float, no tolerance. NaN==NaN
    (parquet hash treats them as equal bit patterns); -0.0 != 0.0 (equal
    under ==, but different bit patterns to a hash)."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            cells_equal_strict(x, y) for x, y in zip(a, b))
    if hasattr(a, "timestamp") and hasattr(b, "timestamp"):
        return str(a) == str(b)
    return type(a) is type(b) and a == b


def driver_canon(tbl, side, key):
    """Replicate the driver's pandas canonicalization EXACTLY: to_pandas(),
    then sort_values over ALL columns (sorted by name). The driver runs this
    before hashing, so anything that makes it throw there must throw HERE --
    round 9 (Decimal) and round 10 (ARRAY outputs -> 'unhashable type:
    numpy.ndarray' in sort_values) both slipped through because the local
    gate skipped this step. Returns the canonicalized frame; re-raises
    whatever pandas raises, tagged with which side/key it came from."""
    try:
        pdf = tbl.to_pandas()
        cols = sorted(pdf.columns)
        return pdf[cols].sort_values(by=cols).reset_index(drop=True)
    except Exception as e:
        raise type(e)(f"driver_canon failed on {side} result of '{key}': {e}") from e


def selftest():
    """Prove the gate trips on an array-typed output column (the r10 driver
    failure mode). Exits 0 if driver_canon raises on an ARRAY frame and
    accepts a flat frame; exits 1 otherwise."""
    con = duckdb.connect()
    arr = con.execute(
        "SELECT 1 AS id, [1, 2, 3] AS postings UNION ALL "
        "SELECT 2, [4, 5, 6] ORDER BY id").fetch_arrow_table()
    flat = con.execute(
        "SELECT 1 AS id, '1,2,3' AS postings").fetch_arrow_table()
    try:
        driver_canon(arr, "spark", "selftest")
    except Exception as e:
        driver_canon(flat, "spark", "selftest")  # must NOT raise
        print(f"SELFTEST PASS: array frame raised ({type(e).__name__}: {e}), "
              "flat frame accepted")
        sys.exit(0)
    print("SELFTEST FAIL: driver_canon accepted an ARRAY column -- the local "
          "gate no longer replicates the driver's pandas sort_values crash")
    sys.exit(1)


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    key_filter = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(f"{out_dir}/{d}"))
    # iterate the UNION of output dirs and declared oracles: an oracled
    # query whose Verify run crashed leaves no dir, and skipping it would
    # print an all-green summary for a driver-red round
    for key in sorted(dirs | set(oracles)):
        if key_filter and key not in key_filter:
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output parquet (query crashed in Verify?)")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')").fetch_arrow_table()
        if key not in oracles:
            print(f"ROWS-ONLY {key}: rows={sdf.num_rows} (no oracle)")
            if sdf.num_rows > 0:
                n_pass += 1
            else:
                n_fail += 1
            continue
        try:
            odf = con.execute(oracles[key]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {key}: oracle error: {e}")
            n_fail += 1
            continue
        # Driver-crash parity gate: run the driver's exact pandas
        # canonicalization on both frames before any value compare.
        try:
            driver_canon(sdf, "spark", key)
            driver_canon(odf, "oracle", key)
        except Exception as e:
            print(f"DRIVER-FAIL {key}: driver pandas canonicalization would "
                  f"crash ({type(e).__name__}: {e}) -- flatten the output "
                  "(SURVEY.md 7.3 rule 5)")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {key}: schema spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        tbad = type_mismatches(sdf, odf, scols)
        if tbad:
            for c, st, ot in tbad:
                print(f"TYPE-FAIL {key}: col {c}: spark={st} oracle={ot}")
            n_fail += 1
            continue
        if sdf.num_rows != odf.num_rows:
            print(f"FAIL {key}: rows spark={sdf.num_rows} oracle={odf.num_rows}")
            n_fail += 1
            continue
        srows = list(zip(*[sdf.column(c).to_pylist() for c in scols]))
        orows = list(zip(*[odf.column(c).to_pylist() for c in ocols]))
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            for j, (a, b) in enumerate(zip(sr, orr)):
                if not cells_equal_strict(a, b):
                    bad = (i, scols[j], a, b)
                    break
            if bad:
                break
        if bad is None:
            print(f"PASS {key}: rows={sdf.num_rows}")
            n_pass += 1
            continue
        # Strict failed -- distinguish a real value diff from a float-ulp
        # diff for the diagnostic message.
        i, c, a, b = bad
        if cells_equal_tolerant(a, b):
            print(f"FAIL {key}: row {i} col {c}: spark={a!r} oracle={b!r}"
                  " (within float tolerance, but the driver hashes exact)")
        else:
            print(f"FAIL {key}: row {i} col {c}: spark={a!r} oracle={b!r}")
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
