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

3. Decimal128 on the hash surface (round-15 forensics): see rule 3
   inline below.

4. Libm floor-snaps (round-16 ADVICE): rule 2 matches round() but a
   `floor(<libm chain> + 0.5)` snap has the same cross-engine-drift
   exposure with a BIGINT output type that rule 2 never inspects. Every
   such data-dependent snap must carry a ulp-margin gate (MarginSpec or
   its family spec); FLOOR_SNAP_ALLOW lists the audited (key, column)
   surfaces with their gate. Two-sided: an unlisted new snap fails, and
   an allowlisted entry whose snap disappeared fails as stale.

Usage: python3 tools/oracle_lint.py <sfDir> <verifyOutDir>
"""
import json, re, sys, glob, os
import duckdb

# audited exceptions to lint rule 2 (key, column):
#   fn_math.sq = round(sqrt(o_totalprice), 6) -- sqrt is IEEE-754
#   correctly-rounded (unlike ln/exp/pow), so identical double inputs
#   give bit-identical results on both engines before the round.
ROUND_RATIO_ALLOW = {("fn_math", "sq")}

# audited libm floor-snap surfaces (rule 4): (key, column) -> the ulp-margin
# gate that pins the snap's boundary distance on every fixture SF. The
# benford constants are DATA-INDEPENDENT (nine fixed values) but carry a
# MarginSpec gate anyway; everything else is data-dependent and must keep
# its gate alive or this list goes stale and fails the lint.
FLOOR_SNAP_ALLOW = {
    ("col_entropy", "lp_e6"): "StatsSpec col_entropy margin test",
    ("corpus_heaps", "x"): "MarginSpec corpus_heaps",
    ("corpus_heaps", "y"): "MarginSpec corpus_heaps",
    ("drift_psi", "psi_contrib"): "StatsSpec drift_psi margin test",
    ("events_markov_entropy", "lp_e6"): "MarginSpec events_markov_entropy",
    ("fn_math", "ln_e6"): "MarginSpec fn_math",
    ("fn_math", "lg_e6"): "MarginSpec fn_math",
    ("fn_math", "pw_e6"): "MarginSpec fn_math",
    ("kl_divergence", "lr_e6"): "StatsSpec kl_divergence margin test",
    ("retrieval_rrf", "bm25_e6"):
        "text_bm25's snap expression, gated in CurationSpec",
    ("sim_sparse_cosine", "w"): "MarginSpec sim_sparse_cosine idf",
    ("stats_benford", "benford_e6"): "MarginSpec stats_benford (9 constants)",
    ("stats_benford", "diff_e6"): "MarginSpec stats_benford (9 constants)",
    ("stats_benford_chisq", "nc"): "MarginSpec stats_benford (9 constants)",
    ("stats_benford_chisq", "dc"): "MarginSpec stats_benford (9 constants)",
    ("stats_mutual_info", "mi_e6"): "MarginSpec stats_mutual_info",
    ("stats_theil_u", "mi_e6"): "MarginSpec stats_mutual_info (same cells)",
    ("stats_theil_u", "hnv"): "MarginSpec stats_theil_u marginals",
    ("text_bigram_logprob", "lp_e6"): "FeaturesSpec bigram margin test",
    ("text_bm25", "bm25_e6"): "CurationSpec bm25 margin test",
    ("text_keyword_extract", "idf_e6"): "StatsSpec keyword idf margin test",
    ("text_tfidf", "tfidf_e6"): "CurationSpec tfidf margin test",
    ("text_unigram_logprob", "lp_e6"): "PipelineSpec unigram margin test",
    ("text_zipf", "x"): "MarginSpec text_zipf",
    ("text_zipf", "y"): "MarginSpec text_zipf",
    ("token_pmi", "pmi_e6"): "StatsSpec token_pmi margin test",
    ("udaf_typed", "geo_cents"): "MarginSpec udaf_typed geo_cents",
}

_SQL_TYPES = {"bigint", "int", "integer", "double", "varchar", "hugeint",
              "decimal", "date", "timestamp"}
_LIBM = re.compile(r"\b(ln|log|log10|log2|exp|pow)\s*\(")


def floor_snap_columns(sql):
    """Column aliases defined by floor(<libm chain> + 0.5) in sql.
    sqrt is IEEE-correctly-rounded and deliberately NOT matched."""
    low = sql.lower()
    cols = set()
    for m in re.finditer(r"floor\s*\(", low):
        j = _balanced_end(low, m.end() - 1)
        if j < 0:
            continue
        inner = low[m.end():j]
        if _LIBM.search(inner) and "0.5" in inner:
            # alias = next ` as <word>` past the floor that is not a CAST
            # target type (the snap usually sits inside CAST(... AS BIGINT))
            for am in re.finditer(r"\bas\s+(\w+)", low[j:j + 200]):
                if am.group(1) not in _SQL_TYPES:
                    cols.add(am.group(1))
                    break
    return cols


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
        # Rule 4 (round-16 ADVICE): data-dependent libm floor-snaps need a
        # living ulp-margin gate; unlisted ones fail here.
        snaps = floor_snap_columns(sql)
        for c in sorted(snaps):
            if (key, c) not in FLOOR_SNAP_ALLOW:
                print(f"LINT {key}: col {c} is a floor(libm + 0.5) snap"
                      " without an audited margin gate -- add a MarginSpec"
                      " ulp audit and list it in FLOOR_SNAP_ALLOW")
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
    # Rule 4 stale side: every allowlisted snap must still exist in its
    # oracle, or the entry (and possibly its margin gate) is dead weight.
    live = set()
    for key, sql in oracles.items():
        for c in floor_snap_columns(sql):
            live.add((key, c))
    for pair in sorted(FLOOR_SNAP_ALLOW):
        if pair not in live:
            print(f"LINT stale FLOOR_SNAP_ALLOW entry {pair}: no such"
                  " floor(libm + 0.5) snap in that oracle any more")
            findings += 1
    print(f"== oracle_lint: {findings} finding(s) over {len(oracles)} oracles ==")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
