package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** As-of (temporal / point-in-time) join — for each left row, the single
  * right row with the LARGEST right.ts <= left.ts on the same key; the
  * operator Spark's DataFrame API famously lacks (Pandas `merge_asof`,
  * kdb `aj`, Flink temporal join, DuckDB `ASOF JOIN`).
  *
  * Scale-correct distributed form (the Flink/kdb shape, NOT a join):
  * tag both sides, ONE shuffle co-partitioning the union by key, ONE
  * sort within partitions on (key, ts, side, tiebreak), then a single
  * linear pass carrying the last-seen right payload per key — O(1)
  * state per task, zero join explosion, no per-row probing. A windowed
  * `last_value IGNORE NULLS` over the union expresses the same thing
  * declaratively, but pays a full window-function buffer; the carry
  * pass streams.
  *
  * Determinism contract: right rows sharing (key, ts) resolve to the
  * greatest `rightTieBreak` (they sort last, and the carry overwrites);
  * equal left/right ts MATCH (backward-inclusive — right rows sort
  * before left rows at the same instant).
  *
  * Output: every left column, plus each requested right value column as
  * `asof_<name>` (null when no right row precedes the left row).
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String],
      rightTieBreak: String): DataFrame =
    run(left, right, key, ts, rightVals, rightTieBreak,
      forwardDir = false)

  /** FORWARD as-of: for each left row, the single right row with the
    * SMALLEST right.ts >= left.ts on the same key (Pandas
    * `merge_asof(direction='forward')`; DuckDB `ASOF ... ON l.ts <=
    * r.ts`) -- the "next scheduled event" lookup. Identical machinery
    * to [[backward]] with the within-partition sort REVERSED on ts:
    * scanning descending, the last-seen right row is the minimum
    * ts >= the current left row. Same contracts, mirrored:
    * equal ts MATCH (forward-inclusive), right (key, ts) ties resolve
    * to the greatest `rightTieBreak`. */
  def forward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String],
      rightTieBreak: String): DataFrame =
    run(left, right, key, ts, rightVals, rightTieBreak,
      forwardDir = true)

  private def run(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String],
      rightTieBreak: String, forwardDir: Boolean): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val leftSchema = left.schema
    val rvSchema = StructType(rightVals.map(c =>
      right.schema(c).copy(nullable = true)))
    val keyType = left.schema(key).dataType
    require(right.schema(key).dataType == keyType,
      s"key '$key' type mismatch: $keyType vs ${right.schema(key).dataType}")
    val tsType = left.schema(ts).dataType
    require(right.schema(ts).dataType == tsType,
      s"ts '$ts' type mismatch: $tsType vs ${right.schema(ts).dataType}")

    val unionSchema = StructType(Seq(
      StructField("__k", keyType, nullable = true),
      StructField("__ts", tsType, nullable = true),
      StructField("__side", IntegerType, nullable = false),
      StructField("__tb", LongType, nullable = true),
      StructField("__rv", rvSchema, nullable = true),
      StructField("__lp", leftSchema, nullable = true)))

    val r = right.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tb"),
      struct(rightVals.map(col): _*).as("__rv"),
      lit(null).cast(leftSchema).as("__lp"))
    val l = left.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(1).as("__side"), lit(null).cast("long").as("__tb"),
      lit(null).cast(rvSchema).as("__rv"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lp"))

    // right rows with null key/ts can never BE a match — drop them up
    // front. Left rows always survive (left-join contract): a null-key
    // group has no right rows to carry, and null ts sorts FIRST within
    // its key group (before every right row), so both emit unmatched.
    val u = r.filter(col("__k").isNotNull && col("__ts").isNotNull)
      .unionByName(l)
      .repartition(col("__k"))
      // nulls_first in BOTH directions: a null-ts left row must scan
      // before any right row so it emits unmatched (desc's default
      // nulls-LAST would hand it the smallest right ts as a bogus
      // forward match)
      .sortWithinPartitions(col("__k"),
        if (forwardDir) col("__ts").desc_nulls_first
        else col("__ts").asc_nulls_first,
        col("__side"), col("__tb"))

    val outSchema = StructType(leftSchema.fields ++
      rvSchema.fields.map(f => f.copy(name = s"asof_${f.name}")))
    val nRv = rightVals.length
    assert(u.schema.length == unionSchema.length) // field order as built
    val out = u.mapPartitions { rows =>
      var curKey: Any = null
      var haveKey = false
      var carry: Row = null
      rows.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || curKey != k) { curKey = k; haveKey = true
          carry = null }
        if (row.getInt(2) == 0) { // right side: update the carry
          carry = row.getStruct(4); Iterator.empty
        } else {
          val lp = row.getStruct(5)
          val rv: Seq[Any] =
            if (carry == null) Seq.fill(nRv)(null) else carry.toSeq
          Iterator.single(Row.fromSeq(lp.toSeq ++ rv))
        }
      }
    }(Encoders.row(outSchema))
    out
  }
}
