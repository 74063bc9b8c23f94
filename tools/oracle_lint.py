#!/usr/bin/env python3
"""Standing lint for oracle output-type skew (round-9 lesson: DuckDB
sum(BIGINT) silently widens to HUGEINT -> arrow DECIMAL(38,0), which the
driver's type-sensitive hash rejects against a Spark BIGINT even when all
values match). Compares ONLY the arrow schema of each Spark verify output
vs its oracle (oracle wrapped in LIMIT 0 so no data is computed) -- run it
in the gate loop after graft.Verify; zero findings required.

Usage: python3 tools/oracle_lint.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

# one source of truth for table list + type canonicalization: a drifted
# copy here would let this lint disagree with the value gate
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, canon_type


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    findings = 0
    for key, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"LINT {key}: no spark output to check against")
            findings += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}') LIMIT 0"
        ).fetch_arrow_table()
        try:
            odf = con.execute(
                f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table()
        except Exception as e:
            print(f"LINT {key}: oracle error: {e}")
            findings += 1
            continue
        stypes = {f.name: canon_type(f.type) for f in sdf.schema}
        otypes = {f.name: canon_type(f.type) for f in odf.schema}
        if set(stypes) != set(otypes):
            print(f"LINT {key}: columns spark={sorted(stypes)}"
                  f" oracle={sorted(otypes)}")
            findings += 1
            continue
        for c in sorted(stypes):
            if stypes[c] != otypes[c]:
                print(f"LINT {key}: col {c}: spark={stypes[c]}"
                      f" oracle={otypes[c]}"
                      " -- add an explicit CAST so both engines agree")
                findings += 1
    print(f"== oracle_lint: {findings} finding(s) over {len(oracles)} oracles ==")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
