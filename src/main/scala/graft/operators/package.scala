package graft

/** Public operator library — the reusable distributed kernels behind the
  * keyed query suite, exposed for direct use on any `DataFrame` with the
  * documented column contracts. Everything here is engine-grade Spark:
  * declarative plans where Catalyst's operators suffice, with explicit
  * physical shapes (range partitioning, bounded heaps, broadcast model
  * state) only where the built-ins would not survive a 1000-executor /
  * 100 TB deployment.
  *
  * ==Order statistics and distributions==
  *  - [[operators.ExactQuantiles]] — exact interpolated quantiles (the
  *    `quantile_cont` contract) via range-repartition + partition-count
  *    walks; no O(distinct) aggregation buffer, per group or global.
  *  - [[operators.WeightedQuantiles]] — exact lower weighted quantiles by
  *    cross-multiplied integer predicates over the (group, value) domain;
  *    composable with other aggregates in one pass.
  *  - [[operators.RangePrefixSum]] — distributed running sums under a
  *    total order (two-pass range-partitioned shape; replaces the
  *    single-task partition-less window).
  *  - [[operators.GroupedRanks]] — doubled average ranks over weighted
  *    value domains, in both the window form and the range-partitioned
  *    swap for few-giant-group deployments (spec-proved identical).
  *  - [[operators.TopK]] — per-group top-k as partial/final bounded heaps
  *    (a custom `SparkPlan`), plus the `TopKRewrite` rule that replans the
  *    `row_number() <= k` window idiom automatically.
  *
  * ==Statistics==
  *  - [[operators.CorrMatrix]] — one-pass Pearson correlation matrix over
  *    k integer-valued columns: exact DECIMAL(38,0) moments, integer-only
  *    hash surface (r2_e6 + r_sign via [[functions.ExactRatio]]),
  *    degenerate pairs excluded exactly.
  *
  * ==Similarity / retrieval==
  *  - [[operators.CoarseQuantizer]] — deterministic integer-Lloyd coarse
  *    quantizer (IVF cell assignment) with broadcast-sized model state.
  *  - [[operators.IvfPqIndex]] — cell-partitioned product-quantization
  *    code table with streaming micro-batch appends.
  *
  * ==Graphs==
  *  - [[operators.ConnectedComponents]] — alternating-stars label
  *    propagation over pair graphs (dedup clustering).
  *  - [[operators.Pagerank]] — bounded-iteration hybrid PageRank.
  *
  * ==Joins==
  *  - [[operators.AsofJoin]] — as-of / nearest-event temporal joins.
  *  - [[operators.SaltedJoin]] — skew-salted equi-joins.
  *
  * Exactness contracts shared across the library: callers snap measures
  * to integer units first (cents, counts, scaled logs); every
  * cross-engine-hashed output is an exact integer (SURVEY §7.3 rule 3);
  * cache lifecycles follow [[graft.Caching]]'s ownership contract.
  */
package object operators
