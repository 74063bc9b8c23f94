#!/usr/bin/env python3
"""Local dev replica of the driver's t2 gate: run graft.Verify output vs
DuckDB oracles and report per-query row/schema/value match.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [keyFilter...]
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
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


def cells_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    key_filter = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(f"{out_dir}/{d}"))
    for key in dirs:
        if key_filter and key not in key_filter:
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output parquet")
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
        scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {key}: schema spark={scols} oracle={ocols}")
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
                if not cells_equal(a, b):
                    bad = (i, scols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {key}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            # exact-equality check too (the driver hashes, no tolerance)
            exact = all(norm(a) == norm(b)
                        for sr, orr in zip(srows, orows)
                        for a, b in zip(sr, orr))
            tag = "PASS" if exact else "PASS~(float-tol only!)"
            print(f"{tag} {key}: rows={sdf.num_rows}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
