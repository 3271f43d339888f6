package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ArrayType(FloatType)` embeddings.
  *
  * Re-expresses the reference engine's vector-distance surface (the
  * `DISTANCE=L2` HNSW index scan, /root/reference/src/tools/load.py:26, and
  * the cosine/inner-product variants its vector store exposes) as Spark
  * higher-order-function expressions. These stay inside whole-stage codegen
  * (no UDF serialization), compute in Double for oracle reproducibility
  * (SURVEY.md §7.5), and distribute trivially: a distance is a per-row
  * scalar, so a top-k over it is a `TakeOrderedAndProject` — no shuffle of
  * the full table, only k rows per partition reach the driver.
  *
  * At 100 TB these are scan-bound: the parquet reader prunes to the
  * embedding column, each task computes distances for its split, and only
  * per-partition top-k survives. Promote to a codegen'd Catalyst
  * `Expression` (see [[graft.plans.VectorExpressions]]) if the HOF form
  * shows up in profiles.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Sum of element-wise products, accumulated in Double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, x) => s + x)

  /** Squared L2 distance (cheaper than l2 when only ordering matters —
    * monotone in l2, so top-k by either is identical). */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (s, x) => s + x)

  /** Euclidean (L2) distance — the reference index's metric. */
  def l2Distance(a: Column, b: Column): Column = sqrt(l2Squared(a, b))

  /** L2 norm of a single vector. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Unit-normalize a vector (Array[Double] out); all-zero stays all-zero. */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => d(x)))
      .otherwise(transform(a, x => d(x) / n))
  }

  // ---- native codegen'd variants (graft.plans.VectorExpressions) ------
  // Same semantics as the HOF forms above, one fused Java loop per row —
  // use on hot scan paths. The session must have the functions registered
  // (VectorExpressions.ensureRegistered(spark) or GraftExtensions).

  def l2DistanceNative(a: Column, b: Column): Column =
    sqrt(call_function("graft_l2sq", a, b))

  def l2SquaredNative(a: Column, b: Column): Column =
    call_function("graft_l2sq", a, b)

  def dotProductNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def cosineSimilarityNative(a: Column, b: Column): Column =
    call_function("graft_cos", a, b)

  /** Random-hyperplane LSH bucket (sign bits of dots with the packed
    * row-major plane matrix) — see
    * [[graft.plans.HyperplaneBucketExpr]]. The plane matrix becomes ONE
    * array literal (`typedLit`), not bits·dim individual `lit()`
    * expressions — a 512-element plane set would otherwise bloat every
    * plan it appears in. */
  def hyperplaneBucketNative(vec: Column, packedPlanes: Seq[Double])
      : Column = {
    require(packedPlanes.nonEmpty, "packedPlanes must be non-empty")
    call_function("graft_hyperplane_bucket", vec, typedLit(packedPlanes))
  }

  /** Sparse (map<int,float>) dot product — the reference's lexical-weight
    * fusion term (bge.py:178,222). Iterates `a`'s entries and probes `b`;
    * pass the smaller map as `a` for fewer probes. */
  def sparseDot(a: Column, b: Column): Column =
    aggregate(
      map_entries(a),
      lit(0.0),
      (s, e) => s + when(map_contains_key(b, e.getField("key")),
        d(e.getField("value")) * d(element_at(b, e.getField("key"))))
        .otherwise(lit(0.0)))
}
