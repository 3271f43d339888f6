package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampler.systematicWeighted]] — slot-count exactness,
  * proportionality bounds, agreement with a single-pass reference, and
  * the layout invariance the q120 oracle's single-window replay
  * assumes. */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 500).map(i => (i.toLong, (i % 37 + 1).toLong))

  /** driver-side reference: one sequential walk of the cumulative line */
  private def reference(k: Int): Map[Long, Long] = {
    val total = rows.map(_._2).sum
    var cum = 0L
    rows.flatMap { case (id, w) =>
      val prev = cum; cum += w
      val slots = (cum * k) / total - (prev * k) / total
      if (slots > 0) Some(id -> slots) else None
    }.toMap
  }

  private def run(k: Int, parts: Int): Map[Long, Long] =
    Sampler.systematicWeighted(
        rows.toDF("id", "w").repartition(parts), "id", "w", k)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("multiplicities sum to exactly k and match the sequential reference") {
    for (k <- Seq(1, 7, 50, 499)) {
      val got = run(k, 8)
      assert(got.values.sum == k, s"k=$k: slots sum ${got.values.sum}")
      assert(got == reference(k), s"k=$k diverged from reference walk")
    }
  }

  test("sample is bit-identical under any input partitioning") {
    assert(run(37, 1) == run(37, 13),
      "sample moved with input partition count")
  }

  test("a row holding half the weight takes floor-or-ceil of half the slots") {
    val skewed = Seq((0L, 500L), (1L, 250L), (2L, 250L)).toDF("id", "w")
    for (k <- Seq(3, 10, 11)) {
      val got = Sampler.systematicWeighted(skewed, "id", "w", k)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val half = got.getOrElse(0L, 0L)
      assert(half == k / 2 || half == (k + 1) / 2,
        s"k=$k: half-weight row got $half slots")
      assert(got.values.sum == k)
    }
  }

  test("rejects k*W overflow and non-positive totals loudly") {
    val big = Seq((0L, Long.MaxValue / 2), (1L, Long.MaxValue / 2))
      .toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampler.systematicWeighted(big, "id", "w", 1000)
    }
    assert(e.getMessage.contains("overflow"))
  }
}
