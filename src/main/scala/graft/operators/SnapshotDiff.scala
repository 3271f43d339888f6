package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff: classify every key of two corpus versions
  * as added / removed / changed / unchanged in ONE co-partitioned
  * full-outer join.
  *
  * This is the primitive an incremental 100 TB pipeline runs between
  * crawl drops instead of reprocessing the world: downstream stages
  * (re-embed, re-index, re-dedup) consume only the `added`/`changed`
  * keys, and `removed` keys drive index tombstones. Scale shape:
  *
  *  - the join ships (key, fingerprint) pairs, never the payload —
  *    for a text corpus that is ~40 bytes/row instead of the document
  *    body, so the shuffle is keyspace-sized;
  *  - both sides hash-partition on the SAME key, so AQE plans a plain
  *    shuffled hash/sort-merge join with no skew surprises (keys are
  *    unique per side by contract);
  *  - change detection is fingerprint equality (callers pass e.g.
  *    `md5(text)`), not payload comparison — the widest row costs the
  *    same 16 bytes to compare.
  *
  * Presence is tracked with explicit marker columns, NOT fingerprint
  * nullness — a null fingerprint (e.g. `md5(NULL)` from a null text)
  * must read as "present with empty content", not "row missing", or
  * a null-text row would misclassify as added+removed. Fingerprints
  * compare null-safely: null == null is `unchanged`.
  */
object SnapshotDiff {

  /** One row per key in either snapshot: (keys..., status) with
    * status ∈ added | removed | changed | unchanged. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      fingerprint: Column): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val o = oldDf.select(keyCols.map(col) :+ fingerprint.as("__fp_old"): _*)
      .withColumn("__in_old", lit(1))
    val n = newDf.select(keyCols.map(col) :+ fingerprint.as("__fp_new"): _*)
      .withColumn("__in_new", lit(1))
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__fp_old") <=> col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Merkle-style anti-entropy digest per group (per partition, per
    * source, per replica...): `(groups..., n_rows, xor_digest,
    * sum_digest, min/max fp)` over a row fingerprint — the
    * constant-size summary two sides of a replication/CDC boundary
    * exchange to find WHERE they diverge before shipping any data
    * (compare digests per group; only mismatched groups re-sync).
    *
    * Exact, order-free, MERGEABLE integer accumulators (the sketch
    * merge discipline): `xor_digest` = bit_xor of the 52-bit md5
    * prefix of each row's fingerprint (disjoint unions merge by xor),
    * `sum_digest` = the sum of the 40-bit prefixes (n ≤ 2^23 rows per
    * group stays overflow-safe in a long; a group bigger than that
    * should be digested at a finer grain). TWO independent
    * accumulators on purpose: a duplicated row PAIR cancels out of
    * the xor (x ⊕ x = 0) but not out of count + sum — either alone
    * has a blind spot, together a divergence cannot hide. Min/max
    * fingerprints bound the keyspace for range-narrowing protocols. */
  def digest(df: DataFrame, groupCols: Seq[String],
      fingerprint: Column): DataFrame = {
    require(groupCols.nonEmpty, "digest needs at least one group column")
    val h = md5(fingerprint.cast("string"))
    df.select(groupCols.map(col) :+
        conv(substring(h, 1, 13), 16, 10).cast("long").as("__h52") :+
        conv(substring(h, 1, 10), 16, 10).cast("long").as("__h40"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h52)").as("xor_digest"),
        sum(col("__h40")).as("sum_digest"),
        min(col("__h52")).as("min_fp"),
        max(col("__h52")).as("max_fp"))
  }
}
