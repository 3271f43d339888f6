package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-dimension statistics of an embedding column — the QA pass
  * before PCA/whitening or an index build: which dimensions are
  * redundant (high |covariance|), which carry no signal. The input to
  * every classical decomposition is the Gram/covariance matrix, and at
  * corpus scale THAT is the expensive object — once the dim×dim
  * moments exist (KBs), the eigen-work is driver-trivial. This
  * operator produces those moments exactly.
  *
  * Deterministic-integer regime: vectors are quantized
  * `floor(v·2^10 + 0.5)` to longs first, so every moment
  * (n, Σqᵢ, Σqᵢqⱼ) is an order-free long sum — bit-stable under any
  * partitioning and replayable in SQL — where double accumulation
  * would be partition-order-dependent (the q131 argument, applied to
  * the whole matrix). Doubles appear only in the final per-pair
  * Pearson correlation (two correctly-rounded sqrts and one division,
  * floor-rounded at 6 dp).
  *
  * Scale shape: ONE corpus pass, mapPartitions accumulate-into-array
  * (the [[graft.functions.BatchEmbedder]] seam pattern): each
  * partition folds its rows into one local long array of
  * `dim·(dim+1)/2 + dim + 1` cells — upper-triangle products, linear
  * sums, count — in a tight primitive loop, then emits its cells as
  * `(i, j, s)` partials; the one shuffle carries
  * `numPartitions · cells` rows (2 145 cells at dim 64) regardless of
  * corpus size OR dim. The first cut of this operator built the cell
  * array per ROW through `transform`/`flatten` higher-order functions
  * + explode — HOFs evaluate interpreted (CodegenFallback), and that
  * construction alone measured 2.4 s at sf0.1; the partition fold
  * removed it (momentsExploded stays as the spec cross-check, pinned
  * bit-equal). Overflow bound: |q| ≤ 2^10·|v|, so
  * n·Σqᵢqⱼ − Σqᵢ·Σqⱼ ≤ n²·2^22·max|v|² — inside a long for
  * n ≤ 2^20 rows at |v| ≤ 2, and the quantization scale is the knob
  * for bigger corpora. */
object VectorStats {

  /** quantization scale — 2^10 keeps q ≤ ~2^10, products ≤ ~2^20,
    * and the headroom analysis above simple */
  val QuantScale = 1024

  /** All integer moments in ONE pass — the mapPartitions
    * accumulate-into-array spelling (see object scaladoc): each
    * partition folds into one local cell array in a tight primitive
    * loop, then emits its cells as already-keyed `(i, j, s)` partials
    * merged by a cells-sized groupBy-sum. Key space: (i≥0, j≥0) =
    * Σqᵢqⱼ upper triangle, (i≥0, j=−1) = Σqᵢ, (−1, −1) = row
    * count. */
  private[operators] def moments(df: DataFrame,
      vecCol: String): DataFrame =
    validateOneDim(momentPartials(df, vecCol)
      .groupBy(col("i"), col("j")).agg(sum(col("s")).as("s")))

  /** STREAMING face of [[moments]]: the identical per-partition fold,
    * with the running cells as a streaming aggregation (the
    * max/sum-merge state update — use update or complete output
    * mode). The cross-partition dim tripwire is a window and cannot
    * run on a stream, so the `(-2, dim)` marker cells STAY IN STATE
    * (a `(-2, dim)` group per distinct dim ever seen) and the check
    * runs at snapshot time: read the state through [[snapshotCells]],
    * which raises on more than one distinct marker and strips them —
    * a stream partition feeding a different dim is caught the first
    * time anyone consumes the artifact, not silently merged (r14
    * advice). Mixed dims WITHIN a micro-batch partition still fail
    * loudly in the fold itself. Because the cells are exact integer
    * sums, the streaming state is the artifact — the same group-merge
    * argument as [[momentsMaintained]]. */
  def momentsStream(df: DataFrame, vecCol: String): DataFrame =
    momentPartials(df, vecCol)
      .groupBy(col("i"), col("j")).agg(sum(col("s")).as("s"))

  /** Consume a [[momentsStream]] state snapshot: assert ONE distinct
    * dim marker (raise on a mixed-dim keyspace) and strip the marker
    * rows, yielding the exact [[moments]] cell frame. */
  def snapshotCells(cells: DataFrame): DataFrame =
    validateOneDim(cells,
      "moments: mixed vector dims across stream partitions — the " +
        "snapshot merges incompatible cell keyspaces")

  /** the shared mapPartitions fold: already-keyed `(i, j, s)` partial
    * cells per partition, plus a `(-2, dim, 1)` marker cell per
    * partition for the batch path's cross-partition dim tripwire. */
  private def momentPartials(df: DataFrame,
      vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.filter(col(vecCol).isNotNull).select(col(vecCol))
    val partials = vecs.mapPartitions { it =>
      var acc: Array[Long] = null
      var dim = -1
      it.foreach { row =>
        val v = row.getSeq[Float](0)
        if (dim < 0) {
          dim = v.length
          acc = new Array[Long](dim * (dim + 1) / 2 + dim + 1)
        }
        require(v.length == dim,
          s"moments: mixed vector dims in one corpus ($dim vs " +
            s"${v.length}) — quantized moments would be meaningless")
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          q(i) = math.floor(
            v(i).toDouble * QuantScale + 0.5).toLong
          i += 1
        }
        var c = 0
        i = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            acc(c) += q(i) * q(j); j += 1; c += 1
          }
          i += 1
        }
        i = 0
        while (i < dim) { acc(c) += q(i); i += 1; c += 1 }
        acc(c) += 1L
      }
      if (acc == null) Iterator.empty
      else {
        val dimF = dim
        val out = Iterator.newBuilder[(Int, Int, Long)]
        var c = 0
        var i = 0
        while (i < dimF) {
          var j = i
          while (j < dimF) { out += ((i, j, acc(c))); j += 1; c += 1 }
          i += 1
        }
        i = 0
        while (i < dimF) { out += ((i, -1, acc(c))); i += 1; c += 1 }
        out += ((-1, -1, acc(c)))
        out += ((-2, dimF, 1L)) // cross-partition dim marker
        out.result()
      }
    }
    partials.toDF("i", "j", "s")
  }

  /** Cross-partition dim tripwire shared by both moment spellings
    * (r13 advice): each partition (or row, in the exploded spelling)
    * emits a `(-2, dim, ·)` marker cell; more than one distinct
    * marker after the merge means the corpus mixes vector dims — the
    * per-partition latch alone cannot see that, and merging the cell
    * keyspaces would produce silently wrong statistics. The check
    * rides the VALUE column so column pruning cannot elide it; marker
    * rows are removed from the output. */
  private def validateOneDim(cells: DataFrame,
      msg: String = "moments: mixed vector dims across partitions — " +
        "quantized moments over incompatible cell keyspaces would be " +
        "meaningless"): DataFrame = {
    // CELLS-sized global window (≤ dim²/2 + dim + marker rows), never
    // the corpus — one extra single-partition exchange over a tiny
    // frame, chosen over a self-join that would re-evaluate the whole
    // corpus-scan subtree for the marker count
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("__nd",
        sum(when(col("i") === -2, 1L).otherwise(0L)).over(w))
      .filter(col("i") =!= -2)
      .select(col("i"), col("j"),
        when(col("__nd") > 1L, raise_error(lit(msg)))
          .otherwise(col("s")).as("s"))
  }

  /** The explode spelling of [[moments]] (kept as the cross-check:
    * spec pins bit-equality with the mapPartitions fold): rows
    * `(i, j, s)` where (i≥0, j≥0) carries Σqᵢqⱼ over the upper
    * triangle i ≤ j, (i≥0, j=−1) carries Σqᵢ, and (−1, −1) carries
    * the row count. */
  private[operators] def momentsExploded(df: DataFrame,
      vecCol: String): DataFrame = {
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(QuantScale) + lit(0.5))
        .cast("long"))
    val idx = sequence(lit(0), size(col("__q")) - 1)
    df.filter(col(vecCol).isNotNull)
      .select(q.as("__q"))
      .select(explode(concat(
        flatten(transform(idx,
          i => transform(sequence(i, size(col("__q")) - 1),
            j => struct(i.as("i"), j.as("j"),
              (element_at(col("__q"), i + 1) *
                element_at(col("__q"), j + 1)).as("s"))))),
        transform(idx, i => struct(i.as("i"), lit(-1).as("j"),
          element_at(col("__q"), i + 1).as("s"))),
        array(struct(lit(-1).as("i"), lit(-1).as("j"),
          lit(1L).as("s")),
          struct(lit(-2).as("i"), size(col("__q")).as("j"),
            lit(1L).as("s"))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.s")).as("s"))
      .transform(c => validateOneDim(c))
  }

  /** Top principal direction by EXACT-INTEGER power iteration over the
    * [[moments]] cells — the PCA stage that precedes whitening, MRL
    * truncation analysis, or an index build, kept inside the repo's
    * replayable-arithmetic regime: the (scaled) covariance is
    * `C = n·S − m·mᵀ` where `S = Σ qᵢqⱼ` and `m = Σ qᵢ` are the exact
    * long cells [[moments]] already produces, so the matvec
    * `y = n·(S·v) − m·(mᵀ·v)` is integer arithmetic with no float
    * anywhere; each iteration renormalizes to `±scale` by magnitude-
    * truncating division (`sign(y)·(|y|·scale ÷ max|y|)` — absolute
    * values keep floor == truncation on both engines). The start
    * vector is a fixed LCG-style spread (no RNG). BigInt throughout —
    * at production counts the intermediate `n²·2^36` exceeds a long,
    * and a silent wrap would corrupt the direction (the oracle
    * replays in 128-bit HUGEINT).
    *
    * Scale shape: the CORPUS pass is the one [[moments]] aggregation
    * (one exchange, map-side combined); the iteration runs driver-side
    * on the dim²-sized cell summary — the correct distributed split
    * for moment-based PCA (the same cells serve q138's covariance
    * report). Output: (dim_i, pc1) with pc1 ∈ [−scale, scale]. */
  def powerIterationPc(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 5, scale: Long = 1024L): DataFrame =
    powerIterationPcFromCells(df.sparkSession, moments(df, vecCol),
      dim, iters, scale)

  /** [[powerIterationPc]] from an already-materialized cell frame —
    * the consumer face of the maintained-artifact lifecycle: a cell
    * frame kept fresh by [[momentsMaintained]] (or snapshotted from
    * [[momentsStream]]'s state) yields bit-identical directions to a
    * fresh corpus recompute (spec), so the PCA never rescans the
    * corpus under CDC. */
  def powerIterationPcFromCells(spark: SparkSession,
      cellsDf: DataFrame, dim: Int,
      iters: Int = 5, scale: Long = 1024L): DataFrame = {
    require(dim >= 1 && iters >= 1 && scale >= 1,
      s"need dim/iters/scale >= 1, got ($dim, $iters, $scale)")
    val cells = cellsDf.select(col("i"), col("j"), col("s")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // a raw [[momentsStream]] state still carries its (-2, dim)
    // markers; silently ignoring them would skip the mixed-dim check
    // the markers exist for and compute directions over merged
    // incompatible keyspaces (r15 advice) — force the snapshot
    // through [[snapshotCells]]
    require(!cells.keys.exists(_._1 == -2),
      "powerIterationPc: cells contain stream dim-marker rows " +
        "(i = -2) — route a momentsStream state snapshot through " +
        "snapshotCells before consuming it")
    def cell(i: Int, j: Int): BigInt = BigInt(cells.getOrElse((i, j),
      throw new IllegalArgumentException(
        s"powerIterationPc: missing moment cell ($i, $j) — does the " +
          s"corpus really have dim $dim?")))
    val n = BigInt(cells.getOrElse((-1, -1), 0L))
    require(n > 0, "powerIterationPc: empty corpus")
    val m = Array.tabulate(dim)(i => cell(i, -1))
    val s2 = Array.tabulate(dim, dim)((i, j) =>
      cell(math.min(i, j), math.max(i, j)))
    var v = Array.tabulate(dim)(i =>
      BigInt((i * 2654435761L) % 2039L - 1019L))
    for (_ <- 0 until iters) {
      val mv = (0 until dim).map(j => m(j) * v(j)).sum
      val y = Array.tabulate(dim)(i =>
        n * (0 until dim).map(j => s2(i)(j) * v(j)).sum - m(i) * mv)
      val mx = y.map(_.abs).max
      v = if (mx == 0) Array.fill(dim)(BigInt(0))
        else y.map(x =>
          (if (x < 0) BigInt(-1) else BigInt(1)) * (x.abs * scale / mx))
    }
    import spark.implicits._
    (0 until dim).map(i => (i.toLong, v(i).toLong))
      .toDF("dim_i", "pc1")
  }

  /** Top TWO principal directions — [[powerIterationPc]]'s exact-
    * integer regime extended by per-step integer Gram-Schmidt: pc2's
    * iteration applies the SAME covariance matvec and then projects
    * the iterate off pc1 exactly — `z = d·y − (uᵀy)·u` with
    * `d = uᵀu` — before the ±scale renormalization. Projection each
    * step (rather than one-shot matrix deflation) keeps the iterate
    * orthogonal to the FINITE-precision pc1 exactly, every operation
    * stays integer, and no eigenvalue ratio ever needs representing.
    * One corpus pass (the shared [[moments]] cells serve both
    * directions); both iterations are driver-side on the dim² summary.
    * Output: (dim_i, pc1, pc2). */
  def powerIterationPc2(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 5, scale: Long = 1024L): DataFrame = {
    require(dim >= 1 && iters >= 1 && scale >= 1,
      s"need dim/iters/scale >= 1, got ($dim, $iters, $scale)")
    val spark = df.sparkSession
    val cells = moments(df, vecCol).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    def cell(i: Int, j: Int): BigInt = BigInt(cells.getOrElse((i, j),
      throw new IllegalArgumentException(
        s"powerIterationPc2: missing moment cell ($i, $j) — does the " +
          s"corpus really have dim $dim?")))
    val n = BigInt(cells.getOrElse((-1, -1), 0L))
    require(n > 0, "powerIterationPc2: empty corpus")
    val m = Array.tabulate(dim)(i => cell(i, -1))
    val s2 = Array.tabulate(dim, dim)((i, j) =>
      cell(math.min(i, j), math.max(i, j)))
    def matvec(v: Array[BigInt]): Array[BigInt] = {
      val mv = (0 until dim).map(j => m(j) * v(j)).sum
      Array.tabulate(dim)(i =>
        n * (0 until dim).map(j => s2(i)(j) * v(j)).sum - m(i) * mv)
    }
    def renorm(y: Array[BigInt]): Array[BigInt] = {
      val mx = y.map(_.abs).max
      if (mx == 0) Array.fill(dim)(BigInt(0))
      else y.map(x =>
        (if (x < 0) BigInt(-1) else BigInt(1)) * (x.abs * scale / mx))
    }
    var u = Array.tabulate(dim)(i =>
      BigInt((i * 2654435761L) % 2039L - 1019L))
    for (_ <- 0 until iters) u = renorm(matvec(u))
    val d = (0 until dim).map(j => u(j) * u(j)).sum
    var v = Array.tabulate(dim)(i =>
      BigInt((i * 40503L) % 1021L - 510L))
    for (_ <- 0 until iters) {
      val y = matvec(v)
      val uy = (0 until dim).map(j => u(j) * y(j)).sum
      v = renorm(Array.tabulate(dim)(i => d * y(i) - uy * u(i)))
    }
    import spark.implicits._
    (0 until dim).map(i => (i.toLong, u(i).toLong, v(i).toLong))
      .toDF("dim_i", "pc1", "pc2")
  }

  /** PCA projection map — the [[powerIterationPc2]] artifact APPLIED
    * at corpus scale: every row's quantized vector projects onto the
    * two integer principal directions (`projₖ = Σ qᵢ·pcₖᵢ` — pure
    * integer dot products with broadcast-literal directions, one
    * narrow corpus pass, no shuffle until the bucket counts), then a
    * 2-D histogram over `bucketWidth`-wide integer cells — the
    * "embedding map" QA report (cluster structure, outlier shelves,
    * mode collapse) every corpus review starts from. Bucketing uses
    * FLOOR division so negative projections bin consistently on both
    * engines. Output: (b1, b2, n_rows), bucket-count-sized. */
  def pcProjectionMap(df: DataFrame, vecCol: String,
      pc1: Seq[Long], pc2: Seq[Long], bucketWidth: Long): DataFrame = {
    require(pc1.nonEmpty && pc1.length == pc2.length,
      s"pc1/pc2 must be same nonzero length, got ${pc1.length}/" +
        s"${pc2.length}")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got " +
      s"$bucketWidth")
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(QuantScale) + lit(0.5))
        .cast("long"))
    def proj(pc: Seq[Long]): org.apache.spark.sql.Column =
      pc.zipWithIndex.map { case (w, i) =>
        element_at(col("__q"), i + 1) * lit(w)
      }.reduce(_ + _)
    df.filter(col(vecCol).isNotNull)
      .select(q.as("__q"))
      .select(
        floor(proj(pc1).cast("double") / lit(bucketWidth.toDouble))
          .cast("long").as("b1"),
        floor(proj(pc2).cast("double") / lit(bucketWidth.toDouble))
          .cast("long").as("b2"))
      .groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Incremental maintenance of the [[moments]] cell artifact under
    * CDC — the moments are EXACT integer sums, so they form a group
    * under addition: after an append/delete batch the maintained
    * cells are `old + moments(appended) − moments(deleted)`,
    * bit-identical to recomputing over the post-CDC corpus
    * (spec-asserted) at the cost of two BATCH-sized passes instead of
    * a corpus pass. This is what makes moment-backed artifacts (the
    * q138 covariance report, the q165/q166 principal directions, the
    * q167 projection map) cheap to keep fresh under streaming ingest:
    * the corpus never rescans. Deleted rows must be passed with their
    * ORIGINAL vectors (the standard CDC requirement — same as the
    * index delete path knowing its doomed ids). */
  def momentsMaintained(oldCells: DataFrame, appended: DataFrame,
      deleted: DataFrame, vecCol: String): DataFrame = {
    // pin the batch cell frames: each is consumed twice below (the
    // merge and its dim marker) and re-deriving one would rescan its
    // CDC batch — the frames themselves are ≤ dim²/2 + dim + 1 rows
    val plus = moments(appended, vecCol)
      .select(col("i"), col("j"), col("s")).localCheckpoint()
    val minus = moments(deleted, vecCol)
      .select(col("i"), col("j"), (-col("s")).as("s")).localCheckpoint()
    // dim tripwire ACROSS the three cell frames (r14 advice): each
    // non-empty frame contributes a (-2, its dim) marker derived from
    // its cell extent; after the merge more than one distinct marker
    // means a CDC batch carried a different vector dim than the
    // maintained artifact — silently merging the keyspaces is the
    // exact failure the within-batch tripwire exists to stop.
    def marker(cells: DataFrame) = cells.filter(col("i") >= 0)
      .agg((max(col("i")) + 1).as("d")).filter(col("d").isNotNull)
      .select(lit(-2).as("i"), col("d").cast("int").as("j"),
        lit(1L).as("s"))
    validateOneDim(
      oldCells.select(col("i"), col("j"), col("s"))
        .unionByName(plus).unionByName(minus)
        .unionByName(marker(oldCells)).unionByName(marker(plus))
        .unionByName(marker(minus))
        .groupBy(col("i"), col("j")).agg(sum(col("s")).as("s")),
      "moments: a CDC batch's vector dim differs from the maintained " +
        "cells' — refusing to merge incompatible cell keyspaces")
  }

  /** Per-dimension standardization parameters — the scaler artifact a
    * whitening/normalization stage exports (sklearn StandardScaler's
    * mean_/scale_, produced once at corpus scale and applied
    * anywhere): mean and population stddev of the QUANTIZED
    * coordinates, decoded back to value units by dividing out
    * [[QuantScale]], both floor-rounded at 6 dp from the exact
    * integer moments (mean = Σq/(n·scale); var·scale² =
    * (n·Σq² − (Σq)²)/n²). Zero-variance dims report std 0 — the
    * consumer must drop or epsilon them, and seeing the 0 here beats
    * a silent divide-by-zero downstream. */
  def dimStandardization(df: DataFrame, vecCol: String): DataFrame = {
    val m = moments(df, vecCol).localCheckpoint()
    val diag = m.filter(col("i") >= 0 && col("i") === col("j"))
      .select(col("i"), col("s").as("ss"))
    val lin = m.filter(col("j") === -1 && col("i") >= 0)
      .select(col("i"), col("s").as("sl"))
    val n = m.filter(col("i") === -1).select(col("s").as("n"))
    lin.join(diag, "i").crossJoin(broadcast(n))
      .select(col("i").cast("long").as("dim"), col("n").as("n_rows"),
        KnnSearch.roundHalfUpCol(
          col("sl").cast("double") /
            (col("n").cast("double") * lit(QuantScale.toDouble)), 6)
          .as("mean_6dp"),
        KnnSearch.roundHalfUpCol(
          sqrt((col("n") * col("ss") - col("sl") * col("sl"))
            .cast("double")) /
            (col("n").cast("double") * lit(QuantScale.toDouble)), 6)
          .as("std_6dp"))
      .orderBy(col("dim"))
  }

  /** The top-`k` most-covariant OFF-diagonal dimension pairs:
    * `(dim_i, dim_j, cov_scaled = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ, corr_6dp)`,
    * ranked by |cov_scaled| (exact longs) with (i, j) ties. The
    * correlation divides the integer covariance by the two integer
    * standard-deviation cores — the q131 spelling per pair. */
  def topCovariantPairs(df: DataFrame, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the aggregated moment frame is ≤ dim·(dim+3)/2 + 1 rows; pin it
    // so the three views below (pairs, linear sums, count) reuse ONE
    // corpus scan instead of re-deriving it per join branch
    val m = moments(df, vecCol).localCheckpoint()
    val pairs = m.filter(col("i") >= 0 && col("j") >= 0 &&
      col("i") < col("j")).select(col("i"), col("j"),
      col("s").as("s_ij"))
    val diag = m.filter(col("i") >= 0 && col("i") === col("j"))
      .select(col("i"), col("s").as("ss"))
    val lin = m.filter(col("j") === -1 && col("i") >= 0)
      .select(col("i"), col("s").as("sl"))
    val dims = lin.join(diag, "i")
    val n = m.filter(col("i") === -1).select(col("s").as("n"))
    pairs
      .join(broadcast(dims.select(col("i"), col("sl").as("s_i"),
        col("ss").as("ss_i"))), "i")
      .join(broadcast(dims.select(col("i").as("j"),
        col("sl").as("s_j"), col("ss").as("ss_j"))), "j")
      .crossJoin(broadcast(n))
      .select(col("i").cast("long").as("dim_i"),
        col("j").cast("long").as("dim_j"),
        (col("n") * col("s_ij") - col("s_i") * col("s_j"))
          .as("cov_scaled"),
        // a zero-variance dim has no correlation: emit NULL, never a
        // divide-by-zero (ANSI mode) or a NaN that sorts surprisingly
        when(col("n") * col("ss_i") - col("s_i") * col("s_i") > 0L &&
            col("n") * col("ss_j") - col("s_j") * col("s_j") > 0L,
          KnnSearch.roundHalfUpCol(
            (col("n") * col("s_ij") - col("s_i") * col("s_j"))
              .cast("double") /
              (sqrt((col("n") * col("ss_i") - col("s_i") * col("s_i"))
                .cast("double")) *
                sqrt((col("n") * col("ss_j") - col("s_j") * col("s_j"))
                  .cast("double"))), 6)).as("corr_6dp"))
      .orderBy(abs(col("cov_scaled")).desc, col("dim_i"), col("dim_j"))
      .limit(k)
  }
}
