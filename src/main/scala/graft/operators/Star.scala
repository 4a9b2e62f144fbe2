package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col}

/** Transitive dimension-predicate pushdown for star-schema joins.
  *
  * Catalyst infers `fact.k = v` from `fact.k = dim.k AND dim.k = v`
  * (constant propagation), but it CANNOT infer a filter across a join
  * equality when the restriction is a *set* reachable only through
  * another join — e.g. TPC-H Q5's `r_name = 'ASIA'` names 5 nation
  * keys, and `c_nationkey = s_nationkey` means non-Asian customers and
  * suppliers can never survive, yet the optimizer still plans the full
  * fact-side volume through every exchange until the first selective
  * join actually runs.
  *
  * At the 100 TB grain that inference gap is the dominant cost: the
  * round-12 sf100 measurement of the naive join order shuffled ~1.95B
  * rows (152.5 s) where the pre-pruned order shuffled ~1.0B (41.6 s).
  * The fix is mechanical and general, so it lives here as an operator:
  * materialize the restricted dimension's key set (small by
  * construction — it is a filtered dimension) and broadcast LEFT SEMI
  * join it into EVERY fact-side table the equality graph reaches,
  * before any fact⋈fact exchange. A semi join neither duplicates rows
  * under key multiplicity nor leaks dimension columns, so it is safe
  * to apply unconditionally; enrichment joins (for dimension
  * attributes the query projects) stay where they were.
  *
  * Plan shape this buys (PlanSpec "transitive dim pruning" guard): on
  * each pruned fact's path from scan to root, a broadcast semi join
  * appears BELOW the first shuffle exchange — the filter runs inside
  * the scan's stage, so every downstream shuffle moves only surviving
  * rows.
  */
object Star {

  /** Pre-filter each `(fact, factKey)` to rows whose key appears in
    * `dim(dimKey)`, via a broadcast left-semi join. `dim` must be
    * small enough to broadcast — which it is whenever this rewrite is
    * semantically available, because it is a *restricted* dimension
    * (the unfiltered dimension joins are still in the query; this
    * operator only adds the implied prunes Catalyst cannot derive).
    */
  def pruneFacts(dim: DataFrame, dimKey: String)(facts: (DataFrame, String)*): Seq[DataFrame] = {
    // rename the key so the semi-join condition stays unambiguous even
    // when a fact table carries a column of the same name; no distinct()
    // — a semi join is insensitive to build-side key multiplicity, and
    // skipping it keeps the broadcast side exchange-free
    val keys = dim.select(col(dimKey).as("__star_key"))
    facts.map { case (fact, factKey) =>
      pruneOne(fact, fact(factKey), keys, keys("__star_key"))
    }
  }

  /** Single-table form of [[pruneFacts]] with explicit key columns. */
  def pruneOne(fact: DataFrame, factKey: Column, dimKeys: DataFrame, dimKey: Column): DataFrame =
    fact.join(broadcast(dimKeys), factKey === dimKey, "left_semi")
}
