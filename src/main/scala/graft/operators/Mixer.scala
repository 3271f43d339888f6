package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-MIXING primitive of a
  * training pipeline (down-weight overrepresented languages/sources,
  * up-weight scarce ones, reproducibly). The reference has no sampling
  * surface; this extends the engine's reproducible-split family
  * ([[graft.functions.TextFunctions.hashSplit]]) from fixed splits to
  * per-stratum RATES.
  *
  * A row is kept iff the first 16 bits of md5(key) — as the 4-hex-char
  * prefix, compared as a string against a per-stratum threshold — fall
  * under rate·2¹⁶. Content-hash gating means: no RNG state, identical
  * decisions on every rerun/engine/partitioning (md5 prefixes are
  * SQL-replayable — the q50 split pattern), per-row independence (a
  * narrow filter, no shuffle, no sort), and the same document keeps or
  * drops consistently across pipeline versions — the property that
  * makes ablation mixes comparable. Granularity is 1/65536 ≈ 0.0015%;
  * rates round half-up to the grid (0 drops the stratum, ≥ 1 keeps all
  * of it).
  *
  * The keep decision composes as a COLUMN ([[keepExpr]]) so callers can
  * combine it with other predicates before a scan prune; [[sample]] is
  * the plain filter form.
  */
object Mixer {

  /** 4-hex-char threshold for `rate` — rows keep when
    * `substring(md5(key), 1, 4) < threshold`. Rates ≥ 1 map to "g",
    * which every hex prefix sorts before (hex digits stop at 'f'). */
  private[graft] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    // floor(x + 0.5), NOT Math.round: the JDK special-cases inputs one
    // ulp below a half (0.49999999999999994 -> 0) while a SQL replay's
    // floor(x + 0.5) rounds them up — for a data-derived rate (q71's
    // temperature rates) that op-sequence mismatch is the same seam
    // class as the round-11 q59/q61 red. The primitive form is the
    // identical IEEE op sequence on any engine.
    val bucket = math.floor(rate * 65536.0 + 0.5).toLong
    if (bucket >= 65536L) "g" else f"${bucket.toInt}%04x"
  }

  /** the deterministic keep/drop decision as a boolean column */
  def keepExpr(
      stratum: Column,
      key: Column,
      rates: Map[String, Double],
      defaultRate: Double): Column = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultRate))) {
        case (acc, (s, r)) =>
          when(stratum === lit(s), lit(thresholdHex(r))).otherwise(acc)
      }
    substring(md5(key), 1, 4) < threshold
  }

  /** `df` filtered to its deterministic per-stratum sample. */
  def sample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame =
    df.filter(keepExpr(col(stratumCol), col(keyCol), rates, defaultRate))

  /** Temperature-scaled mixture rates — the standard multilingual
    * sampling scheme (mC4 / XLM-R: sample stratum i with probability
    * ∝ n_i^τ): keep-rate_i = n_i^(τ−1) / max_j n_j^(τ−1), so the
    * scarcest stratum keeps EVERYTHING (rate 1) and overrepresented
    * strata are down-weighted toward the τ-tempered mix. τ = 1 keeps
    * every stratum whole (no resampling); τ → 0 approaches a uniform
    * mix (rate n_min/n_i). Counts are exact integers (one aggregation
    * scan, driver-side — |strata| scalars), the rates are pure double
    * arithmetic from them, and the keep decision is [[keepExpr]]'s
    * md5 gate — so the whole mix replays deterministically (the pow()
    * cross-library seam is last-ulp, the same accepted class as BM25's
    * ln()). Empty strata get rate 0 (nothing to keep). */
  /** Max-min fair (water-filling) budget allocation across strata —
    * the budget planner that precedes a mix: given each stratum's
    * token DEMAND and a total budget, satisfy small strata in full
    * and cap the large ones at a common water level, so no stratum
    * starves and no token of budget is left unspent (the classic
    * progressive-filling allocation; mC4/data-mixture planning uses
    * exactly this shape to cap head languages).
    *
    * EXACT integers end to end, closed-form over one sorted pass:
    * strata sort ascending by (demand, key); stratum k (of n) is
    * SATISFIED iff `d_k·(n−k+1) ≤ budget − prefix_{k−1}` — the
    * cross-multiplied spelling of `d_k ≤ remaining/(n−k+1)`, and a
    * self-consistent one: if k is unsatisfied then so is every larger
    * k (provable from the inequality, spec-pinned), so the satisfied
    * set is a prefix even though the prefix sums count full demands.
    * Unsatisfied strata split the remaining budget as
    * `base = R div m` with the first `R mod m` of them (in the same
    * sort order) getting one extra — Σ alloc = min(budget, Σ demand)
    * EXACTLY, never an off-by-rounding leak.
    *
    * Scale: the windows run over the AGGREGATED per-stratum frame
    * (strata-count rows, not corpus rows) — a single-partition window
    * here is strata-sized by construction, not the q129 hazard. */
  def waterfill(demands: DataFrame, keyCol: String, demandCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    waterfillCore(demands.withColumn("__budget", lit(budget)),
      keyCol, demandCol)
  }

  /** [[waterfill]] with the budget derived IN-PLAN as
    * `pctTenths/10` of total demand (no driver-side collect — the
    * 1-row total joins back). */
  def waterfillPct(demands: DataFrame, keyCol: String,
      demandCol: String, pctTenths: Int): DataFrame = {
    require(pctTenths >= 0 && pctTenths <= 10,
      s"pctTenths must be in [0, 10], got $pctTenths")
    val tot = demands.agg(
      expr(s"sum($demandCol) * $pctTenths div 10").as("__budget"))
    waterfillCore(demands.crossJoin(broadcast(tot)),
      keyCol, demandCol)
  }

  private def waterfillCore(withBudget: DataFrame, keyCol: String,
      demandCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(demandCol), col(keyCol))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = withBudget
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__pre", coalesce(sum(col(demandCol)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__sat",
        col(demandCol) * (col("__n") - col("__rk") + 1L)
          <= col("__budget") - col("__pre"))
      .withColumn("__satSum",
        sum(when(col("__sat"), col(demandCol)).otherwise(0L)).over(all))
      .withColumn("__satCnt",
        sum(when(col("__sat"), 1L).otherwise(0L)).over(all))
    staged.select(
      col(keyCol),
      col(demandCol).as("demand"),
      when(col("__sat"), col(demandCol))
        .otherwise(
          expr("(__budget - __satSum) div (__n - __satCnt)") +
            when(col("__rk") - col("__satCnt") <=
              expr("(__budget - __satSum) % (__n - __satCnt)"), 1L)
              .otherwise(0L))
        .as("alloc"),
      col("__sat").cast("long").as("satisfied"))
  }

  def temperatureRates(
      counts: Map[String, Long],
      temperature: Double): Map[String, Double] = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0, 1], got $temperature")
    require(counts.nonEmpty, "temperatureRates needs at least one stratum")
    require(counts.values.forall(_ >= 0), s"negative count in $counts")
    val weights = counts.collect { case (s, n) if n > 0 =>
      s -> math.pow(n.toDouble, temperature - 1.0)
    }
    require(weights.nonEmpty, s"every stratum is empty: $counts")
    val wMax = weights.values.max
    counts.map { case (s, n) =>
      s -> (if (n == 0L) 0.0 else weights(s) / wMax)
    }
  }
}
