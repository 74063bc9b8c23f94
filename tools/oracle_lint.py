#!/usr/bin/env python3
"""Standing lints over the oracle contract -- run in the gate loop after
graft.Verify; zero findings required.

1. Output-type skew (round-9 lesson): DuckDB sum(BIGINT) silently widens
   to HUGEINT -> arrow DECIMAL(38,0), which the driver's type-sensitive
   hash rejects against a Spark BIGINT even when all values match.
   Compares ONLY the arrow schema of each Spark verify output vs its
   oracle (oracle wrapped in LIMIT 0 so no data is computed).

2. Fragile-double hash surfaces (round-14 forensics): a DOUBLE output
   column built by round() over a division or sqrt chain is a cross-
   engine coin flip near a rounding-bucket boundary -- five keys failed
   the driver's hash this way while bit-exact against the local oracle.
   Flags any oracled DOUBLE column whose defining round(...) expression
   contains '/' or sqrt; such columns must migrate to exact scaled-
   integer rationals (graft.functions.ExactRatio). ROUND_RATIO_ALLOW
   lists the audited exceptions.

Usage: python3 tools/oracle_lint.py <sfDir> <verifyOutDir>
"""
import json, re, sys, glob, os
import duckdb

# audited exceptions to lint rule 2 (key, column):
#   fn_math.sq = round(sqrt(o_totalprice), 6) -- sqrt is IEEE-754
#   correctly-rounded (unlike ln/exp/pow), so identical double inputs
#   give bit-identical results on both engines before the round.
ROUND_RATIO_ALLOW = {("fn_math", "sq")}


def _balanced_end(s, i):
    """index just past the ')' matching the '(' at s[i]."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


def round_ratio_columns(sql):
    """Column aliases defined by round(<expr with / or sqrt>) in sql."""
    low = sql.lower()
    cols = set()
    for m in re.finditer(r"round\s*\(", low):
        j = _balanced_end(low, m.end() - 1)
        if j < 0:
            continue
        inner = low[m.end():j]
        if "/" in inner or "sqrt" in inner:
            am = re.match(r"\s*as\s+(\w+)", low[j + 1:])
            if am:
                cols.add(am.group(1))
    return cols

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
        fragile = round_ratio_columns(sql)
        for c in sorted(stypes):
            if ("double" in stypes[c] or "float" in stypes[c]) \
                    and c in fragile and (key, c) not in ROUND_RATIO_ALLOW:
                print(f"LINT {key}: col {c} is a DOUBLE from round() over"
                      " a division/sqrt chain -- hash-fragile across oracle"
                      " builds; migrate to an ExactRatio integer surface")
                findings += 1
        # Rule 3 (round-15 forensics): the driver's hash breaks on ANY
        # decimal128 output column -- its duckdb/pandas stack canonicalizes
        # decimals differently per side, magnitude-independent (the 7 r15
        # hash-red keys were EXACTLY the 7 emitting DECIMAL(38,0) while the
        # arrow-strict local gate passed). Unbounded exact moments must ship
        # as ExactRatio.modDigest (abs mod 1e9+7) int64 witnesses instead.
        for c in sorted(stypes):
            if "decimal" in stypes[c]:
                print(f"LINT {key}: col {c} is {stypes[c]} -- the driver's"
                      " hash mangles decimal columns; ship an int64 surface"
                      " (ExactRatio.modDigest for unbounded moments)")
                findings += 1
    print(f"== oracle_lint: {findings} finding(s) over {len(oracles)} oracles ==")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
