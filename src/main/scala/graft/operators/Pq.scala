package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Product quantization (PQ) — the FAISS `PQm` shape, completing the
  * engine's quantization family next to IVF-SQ8 (SURVEY §8.2): the
  * vector is split into `m` subspaces of `dim/m` dimensions, each
  * subspace gets its own small codebook (`ksub` centroids from a
  * k-means fit), and a vector is stored as `m` one-byte codes —
  * m bytes instead of 4·dim float bytes (32× at dim 64 / m 8). The
  * approximate ranking pass reads ONLY the code column and scores each
  * row by the L2² between the query and the row's DECODED vector
  * (per-dimension fold in index order — the same op sequence as
  * [[graft.plans.Sq8L2SquaredExpr]]'s replay discipline, so a SQL
  * oracle reproduces every candidate distance bit-for-bit from the
  * exported codebooks + codes); the top `k·refine` candidates then get
  * an exact re-rank over only their full vectors.
  *
  * Where SQ8's per-dimension affine grid keeps 1 byte PER DIMENSION,
  * PQ keeps 1 byte per SUBSPACE — coarser, smaller, and the standard
  * memory/recall trade-off knob (m up = finer). Like SQ8 the
  * quantization is lossy but DETERMINISTIC: fit, encode, and scoring
  * are all fixed-order double arithmetic, so correctness is
  * hash-checkable end-to-end (q73), not merely recall-graded.
  *
  * The FIT ([[fit]]) follows FAISS practice: train on a small sample,
  * not the corpus — here the `sampleN` lowest-id vectors (a
  * DETERMINISTIC sample: no partition-order or RNG dependence) via one
  * driver-side Lloyd's k-means per subspace with seeded distinct-point
  * init and lowest-index tie-breaks. Codebooks are tiny
  * (m·ksub·dim/m floats) and ride a parquet sidecar like the IVF
  * centroids; the oracle replays scoring FROM the exported artifact,
  * so only the fit itself is trusted — everything downstream is
  * verified (the q36/q62 trust model).
  */
object Pq {

  /** the trained codebooks: `cb(sub)(code)` is the `dim/m`-length
    * centroid for `code` in subspace `sub`. `normalized` records the
    * GEOMETRY the books were trained on — raw vectors (serves L2) or
    * unit-normalized ones (serves cosine: on the unit sphere
    * L2² = 2 − 2·cos, the same grid argument as the SQ8 family's
    * normalize-then-quantize) — and is enforced against the search
    * metric both ways, exactly like the SQ8 metric↔grid contract. */
  final case class Codebooks(dim: Int, m: Int,
      cb: Array[Array[Array[Float]]], normalized: Boolean = false) {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(cb.length == m, s"expected $m subspace codebooks")
    val dsub: Int = dim / m
    val ksub: Int = cb.head.length
    require(cb.forall(_.length == ksub) &&
      cb.forall(_.forall(_.length == dsub)),
      "ragged codebooks")
    require(ksub >= 1 && ksub <= 256,
      s"ksub=$ksub must fit one byte per code")

    /** persist as (sub, code, centroid, normalized) rows — the
      * DuckDB-readable sidecar shape the q73 oracle replays from */
    def write(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      (for (s <- 0 until m; c <- 0 until ksub)
        yield (s, c, cb(s)(c).toSeq, normalized))
        .toDF("sub", "code", "centroid", "normalized")
        .coalesce(1).write.mode("overwrite").parquet(path)
      // a rewrite at a previously-loaded path must not leave the old
      // parsed books behind (r21 advice): the stamp key already stops
      // STALE serving, this keeps dead entries from accumulating and
      // covers the fixture builders that write books sidecars directly
      evictMeta(path)
    }
  }

  def load(spark: SparkSession, path: String): Codebooks =
    // keyed on path + content stamp (r21 verdict #7): sidecars are
    // immutable per WRITE, not per path — a root rebuilt in place by
    // another process must resolve to a fresh key, not be served the
    // old parsed books (in-JVM eviction hooks cannot see foreign
    // writers). The stamp is one listStatus — no Spark job.
    booksCache.computeIfAbsent(
      s"$path|${IvfIndex.fsStamp(spark, path)}",
      _ => loadUncached(spark, path))

  private def loadUncached(spark: SparkSession, path: String): Codebooks = {
    val df = spark.read.parquet(path)
    // pre-round-13 sidecars have no geometry column — raw (L2) books
    val hasNorm = df.columns.contains("normalized")
    val rows = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray,
        hasNorm && r.getBoolean(3)))
    val m = rows.map(_._1).max + 1
    val cb = Array.tabulate(m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    Codebooks(cb.head.head.length * m, m, cb,
      normalized = rows.head._4)
  }

  /** In-JVM cache of DESERIALIZED index metadata — codebooks and
    * [[PqRoot]] sidecars — keyed on the exact path string (r21, guide
    * §1.2 "per-task work"): every PQ query paid 2-4 tiny
    * read-parquet-and-collect JOBS per invocation just to re-parse
    * immutable sidecar bytes it had already parsed (q182 re-loaded
    * four sidecar sets per rep — ~1.5 s of pure metadata job
    * overhead). Sidecars are index ARTIFACTS, not query results: a
    * serving system holds them resident (FAISS keeps the whole index
    * in memory; [[graft.plans.IvfAutoProbe]] already caches the
    * centroid sidecar the same way), and the data scan + ADC + re-rank
    * still compute from parquet on every invocation. Entries are
    * plain arrays (no session references), so they are safe across
    * sessions in one JVM. Eviction rides the SAME invalidation bus
    * every derived artifact uses ([[IvfIndex.onInvalidated]] — fired
    * by appendEncoded/deleteEncoded and the IvfIndex mutators) plus
    * explicit drops in [[writeRoot]]/[[refitRoot]]; a mutated root's
    * whole subtree (books/centroids/perm sidecars live under it) is
    * removed. */
  private val booksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()
  private val rootMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, PqRoot]()
  private[operators] def evictMeta(root: String): Unit = {
    // keys are "path|stamp" since the stamp-keying (r21 verdict #7):
    // match the bare path, any subpath, and any stamped variant
    rootMetaCache.keySet.removeIf(k =>
      k == root || k.startsWith(root + "/") || k.startsWith(root + "|"))
    booksCache.keySet.removeIf(k =>
      k == root || k.startsWith(root + "/") || k.startsWith(root + "|"))
  }
  IvfIndex.onInvalidated(evictMeta)

  /** Train per-subspace codebooks on the `sampleN` LOWEST-ID vectors —
    * a deterministic sample (content-independent of partitioning and
    * RNG; FAISS-style train-on-sample, so the fit cost is O(sample),
    * never O(corpus)). Lloyd's iterations are fixed-order double
    * arithmetic with seeded distinct-point init and lowest-index
    * tie-breaks: the same inputs produce the same codebooks anywhere. */
  def fit(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int = 16,
      sampleN: Int = 256,
      seed: Long = 42L,
      iterations: Int = 10,
      normalized: Boolean = false): Codebooks = {
    val raw = vecs.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    // cosine books train on the UNIT-NORMALIZED sample (the FAISS
    // normalize-then-quantize recipe — encode normalizes the same way)
    val sample =
      if (normalized) raw.map(v => IvfIndex.unitNormalize(v.toSeq).toArray)
      else raw
    require(sample.nonEmpty, "fit needs a non-empty corpus")
    val dim = sample.head.length
    require(sample.forall(_.length == dim), "mixed dimensions in corpus")
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    // PER-SUBSPACE effective k: seeds are DISTINCT POINTS (two equal
    // seeds would freeze one centroid dead for the whole fit — the
    // strict-< assignment tie starves the higher index forever), so a
    // subspace trains with min(ksub, its own distinct-subvector count).
    // One degenerate subspace (a constant or zero-padded dimension
    // block, common in padded embeddings) therefore costs only ITSELF
    // resolution — it must not drag every other subspace's codebook
    // down to its distinct count, which would flatten ADC distances
    // corpus-wide.
    val cb = Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      val kS = math.min(ksub,
        sub.map(_.toSeq).distinct.length)
      lloyd(sub, kS, seed + s, iterations)
    }
    // Codebooks requires rectangular shape: pad short subspaces by
    // REPEATING their last centroid. encode scans codes in ascending
    // order with a strict-< winner, so a duplicate at a higher index
    // can never be selected — padding cannot change any code, score,
    // or replay.
    val kMax = cb.map(_.length).max
    val padded = cb.map { b =>
      if (b.length == kMax) b
      else b ++ Array.fill(kMax - b.length)(b.last.clone())
    }
    Codebooks(dim, m, padded, normalized = normalized)
  }

  /** driver-side Lloyd's k-means: seeded distinct-index init, fixed
    * iteration count, lowest-index assignment ties, empty clusters keep
    * their previous centroid — every step deterministic */
  private[operators] def lloyd(points: Array[Array[Float]], k: Int,
      seed: Long, iterations: Int): Array[Array[Float]] = {
    val d = points.head.length
    // seeds drawn from CONTENT-distinct points (first-occurrence order)
    // so no two initial centroids coincide; k <= distinct count is the
    // caller's (fit's) contract
    val distinctPts = points.map(_.toSeq).distinct.map(_.toArray)
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(distinctPts.indices.toList).take(k).sorted
    var cents = init.map(i => distinctPts(i).clone).toArray
    for (_ <- 0 until iterations) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      points.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0
          var j = 0
          while (j < d) {
            val diff = p(j).toDouble - cents(c)(j).toDouble
            s += diff * diff
            j += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += p(j).toDouble; j += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(d)(j => (sums(c)(j) / counts(c)).toFloat)
      }
    }
    cents
  }

  /** column name of the PQ code bytes [[encode]] adds */
  private[graft] val CodeCol = "__pq_code"

  /** Append the m-byte PQ code to every row (nearest centroid per
    * subspace, per-term double L2², lowest code ties — the fold any
    * replay reproduces). A build/ingest-time pass (mapPartitions with
    * broadcast codebooks — the codebooks are KBs); the search hot path
    * only READS the codes. Null or mis-sized vectors fail loudly — a
    * silent null code would hide rows from every quantized search. */
  def encode(df: DataFrame, vecCol: String, books: Codebooks): DataFrame = {
    require(!df.columns.contains(CodeCol),
      s"input already has a '$CodeCol' column")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(books)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(CodeCol, BinaryType, nullable = false))
    df.mapPartitions { rows =>
      val b = bc.value
      rows.map { row =>
        if (row.isNullAt(vecIdx))
          throw new IllegalArgumentException(
            "Pq.encode: null vector — filter nulls before encoding")
        val vRaw = row.getSeq[Float](vecIdx)
        if (vRaw.length != b.dim)
          throw new IllegalArgumentException(
            s"Pq.encode: vector has dim ${vRaw.length}, codebooks ${b.dim}")
        // cosine books code the unit-normalized vector (the metric's
        // geometry); raw books code the vector as-is
        val v =
          if (b.normalized) IvfIndex.unitNormalize(vRaw).toArray
          else vRaw.toArray
        val code = new Array[Byte](b.m)
        var s = 0
        while (s < b.m) {
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < b.ksub) {
            var acc = 0.0
            var j = 0
            while (j < b.dsub) {
              val diff = v(s * b.dsub + j).toDouble -
                b.cb(s)(c)(j).toDouble
              acc += diff * diff
              j += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          code(s) = best.toByte
          s += 1
        }
        Row.fromSeq(row.toSeq :+ code)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** The per-query ADC lookup table (canonical FAISS ADC): `tab(sub)
    * (code)` is the partial L2² between the query's `sub`-th slice and
    * that code's centroid — each partial the same fixed-order double
    * fold an oracle replays from the exported books. Scoring a row is
    * then `m` table lookups + adds instead of `dim` multiply-adds
    * (~dim/m× less row arithmetic); the row total is the left-assoc
    * sum of partials in subspace order, which an oracle replays as a
    * literal `p0 + p1 + … + p_{m-1}` chain. O(m·ksub·dsub) = one
    * decoded-corpus-row's work to build, KBs to hold. */
  private[operators] def adcTable(b: Codebooks,
      q: Array[Float]): Array[Array[Double]] = {
    require(q.length == b.dim,
      s"query has dim ${q.length}, codebooks ${b.dim}")
    Array.tabulate(b.m) { sub =>
      Array.tabulate(b.ksub) { c =>
        val cent = b.cb(sub)(c)
        var acc = 0.0
        var j = 0
        while (j < b.dsub) {
          val diff = cent(j).toDouble - q(sub * b.dsub + j).toDouble
          acc += diff * diff
          j += 1
        }
        acc
      }
    }
  }

  /** ADC row score against a prebuilt table, with the loud per-row
    * code validation ([[IvfIndex.searchQuantized]]'s guard discipline):
    * a null or mis-sized or out-of-range code means the corpus and the
    * passed codebooks don't match — silently scoring the first bytes
    * against the wrong books would return wrong neighbors with no
    * error. */
  private[operators] def adcScore(tab: Array[Array[Double]],
      code: Array[Byte], m: Int, ksub: Int): Double = {
    if (code == null)
      throw new IllegalArgumentException(
        "Pq: null __pq_code — row not encoded with Pq.encode, or the " +
          "code column was overwritten")
    if (code.length != m)
      throw new IllegalArgumentException(
        s"Pq: code has ${code.length} bytes, codebooks have m=$m " +
          "subspaces — corpus encoded with different codebooks?")
    var s = 0.0
    var sub = 0
    while (sub < m) {
      val ci = code(sub) & 0xFF
      if (ci >= ksub)
        throw new IllegalArgumentException(
          s"Pq: code byte $ci >= ksub=$ksub — corpus encoded with " +
            "different codebooks?")
      s += tab(sub)(ci)
      sub += 1
    }
    s
  }

  /** ADC top-k over a PQ-encoded corpus: the approximate pass scans
    * ONLY `(idCol, __pq_code)` — m bytes per row instead of 4·dim —
    * scoring each row from the per-query [[adcTable]] (`m` lookups +
    * adds; partials and their subspace-order sum are fixed-order double
    * arithmetic, bit-replayable from the exported artifacts), keeps the
    * best `k·refine` candidate ids (unrounded distance, id ties — the
    * [[IvfIndex.searchQuantized]] candidate contract), and exactly
    * re-ranks only those rows' full vectors with the cross-engine floor
    * rounding. At 100 TB the approximate pass is the 32×-lighter scan
    * doing ~dim/m× less row arithmetic, and the exact pass touches
    * k·refine rows. */
  /** IVF-PQ (the FAISS flagship `IVFx,PQm` shape): probe the `nprobe`
    * nearest clusters — the corpus must carry the IVF layout's
    * `__ivf_cluster` partition column, so the filter is directory-level
    * pruning — then run [[topK]]'s two ADC passes over ONLY the probed
    * partitions: the candidate scan reads (id, code) of ~nprobe/nlist
    * of the corpus (m bytes/row of that), and the exact re-rank
    * touches k·refine rows. Probe selection is
    * [[IvfIndex.probeOrder]]'s L2 ranking — identical to the
    * unquantized IVF path, so an oracle replays probes + decode +
    * re-rank entirely from the exported artifacts (q74). */
  def topKProbed(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      books: Codebooks,
      centroids: Array[Array[Float]],
      clusterIds: Array[Int],
      nprobe: Int,
      refine: Int = 4,
      tieBreak: Option[String] = None,
      rankRoundDp: Option[Int] = None,
      metric: KnnSearch.Metric = KnnSearch.NativeL2,
      perm: Option[Array[Int]] = None,
      filter: Option[Column] = None,
      filterSelectivity: Option[Double] = None): DataFrame = {
    require(encoded.columns.contains(IvfIndex.ClusterCol),
      s"corpus has no '${IvfIndex.ClusterCol}' column — IVF-PQ needs " +
        "the IVF cluster layout (assign + partition first, then encode)")
    require(filterSelectivity.isEmpty || filter.isDefined,
      "filterSelectivity without a filter has nothing to compensate")
    filterSelectivity.foreach(sel => require(sel > 0.0 && sel <= 1.0,
      s"selectivity must be in (0, 1], got $sel"))
    // cosine probes rank ANGULARLY on the raw query (the quantized-key
    // ranking the whole cosine IVF family uses) — the books contract
    // itself is enforced inside topK. Probes rank on the RAW query:
    // assignment is in the original coordinates (encodeFor), the OPQ
    // permutation only reorders what the CODES see.
    val cosine =
      requireMetricMatchesBooks(metric, books, "Pq.topKProbed")
    // FILTERED search on the PQ rung (the IvfIndex.search contract):
    // the predicate sits on the probed scan, so both the ADC candidate
    // pass and the exact re-rank see only eligible rows — the k·refine
    // candidate budget is never crowded by ineligible ones — and a
    // known selectivity widens the probe budget by 1/selectivity,
    // capped at the cluster count.
    val np = filterSelectivity.fold(math.max(1, nprobe))(sel =>
      math.min(clusterIds.length,
        math.ceil(math.max(1, nprobe) / sel).toInt))
    val probes =
      (if (cosine) IvfIndex.probeOrderCosine(centroids, clusterIds, query)
       else IvfIndex.probeOrder(centroids, clusterIds, query))
        .take(np)
    val scan = encoded.filter(col(IvfIndex.ClusterCol).isin(probes: _*))
    topK(filter.foldLeft(scan)((d, f) => d.filter(f)),
      idCol, vecCol, query, k, books, refine, tieBreak, rankRoundDp,
      metric, perm)
  }

  /** the PQ metric↔books contract (the SQ8 family's metric↔grid
    * discipline): raw books preserve L2 geometry, not angles — they
    * serve only L2; normalized books serve only cosine. Returns whether
    * the dispatch is cosine. */
  private def requireMetricMatchesBooks(metric: KnnSearch.Metric,
      books: Codebooks, op: String): Boolean = metric match {
    case KnnSearch.L2 | KnnSearch.NativeL2 =>
      require(!books.normalized,
        s"$op: these codebooks were trained on UNIT-NORMALIZED vectors " +
          "(fit(normalized = true)) — they serve cosine searches; L2 " +
          "needs raw books")
      false
    case KnnSearch.Cosine | KnnSearch.NativeCosine =>
      require(books.normalized,
        s"$op: cosine needs codebooks trained on UNIT-NORMALIZED " +
          "vectors — fit(normalized = true); these books are raw (L2). " +
          "PQ codebooks over raw vectors preserve L2 geometry, not " +
          "angles.")
      true
    case other => throw new IllegalArgumentException(
      s"$op supports L2 and Cosine, got $other")
  }

  def topK(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      books: Codebooks,
      refine: Int = 4,
      tieBreak: Option[String] = None,
      rankRoundDp: Option[Int] = None,
      metric: KnnSearch.Metric = KnnSearch.NativeL2,
      perm: Option[Array[Int]] = None): DataFrame = {
    require(encoded.columns.contains(CodeCol),
      s"corpus has no '$CodeCol' column — Pq.encode it first")
    require(k > 0, s"k must be > 0, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(query.length == books.dim,
      s"query has dim ${query.length}, codebooks ${books.dim}")
    perm.foreach(p => require(p.length == books.dim,
      s"perm has length ${p.length}, codebooks dim ${books.dim}"))
    val cosine = requireMetricMatchesBooks(metric, books, "Pq.topK")
    val spark = encoded.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val bc = spark.sparkContext.broadcast(books)
    // OPQ roots: the codes live in the PERMUTED coordinate order, so
    // the ADC table is built against the permuted query (permute FIRST
    // — encode normalizes the permuted vector, so the cosine path must
    // too); the exact re-rank below stays on the raw query and raw
    // vectors, untouched by the rotation
    val qRot = perm.map(p => p.map(i => query(i))).getOrElse(query.toArray)
    // cosine: the codes represent unit-normalized vectors, so the ADC
    // table is built against the unit-normalized query (on the unit
    // sphere L2² is monotone in cosine distance); the exact re-rank
    // below scores TRUE cosine over the raw vectors and raw query
    val q =
      if (cosine) IvfIndex.unitNormalize(qRot.toSeq).toArray else qRot
    val narrow = encoded.select(col(idCol), col(CodeCol))
    val idIdx = 0
    val codeIdx = 1
    val adSchema = StructType(Seq(narrow.schema.head,
      StructField("__pq_d", org.apache.spark.sql.types.DoubleType)))
    val scored = narrow.mapPartitions { rows =>
      val b = bc.value
      // the per-query ADC table, built ONCE per partition (one decoded
      // row's worth of arithmetic), then m lookups + adds per row
      val tab = adcTable(b, q)
      rows.map { row =>
        val code = row.getAs[Array[Byte]](codeIdx)
        Row(row.get(idIdx), adcScore(tab, code, b.m, b.ksub))
      }
    }(org.apache.spark.sql.Encoders.row(adSchema))
    val cand = scored.orderBy(col("__pq_d"), col(idCol))
      .limit(k * refine)
      .select(idCol).collect().map(_.get(0))
    KnnSearch.topK(
      encoded.filter(col(idCol).isin(cand.toSeq: _*)).drop(CodeCol),
      vecCol, query, k,
      if (cosine) KnnSearch.NativeCosine else KnnSearch.NativeL2,
      tieBreak, rankRoundDp = rankRoundDp)
  }

  /** temp column carrying the per-row residual during [[encodeResidual]]
    * / [[fitResidual]] */
  private val ResidCol = "__pq_resid"

  /** Append `outCol` = `v − centroid(cluster(v))` per row — the
    * residual FAISS's IVFPQ actually codes. Fixed arithmetic (double
    * subtract, float cast) per element, broadcast centroid map, narrow
    * map — no shuffle. */
  private def withResidual(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], clusterIds: Array[Int],
      outCol: String): DataFrame = {
    require(df.columns.contains(IvfIndex.ClusterCol),
      s"residual coding needs the '${IvfIndex.ClusterCol}' column — " +
        "assign the corpus to IVF centroids first")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      clusterIds.zip(centroids).toMap)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val cIdx = df.schema.fieldIndex(IvfIndex.ClusterCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false))
    df.mapPartitions { rows =>
      val cmap = bc.value
      rows.map { row =>
        if (row.isNullAt(vecIdx))
          throw new IllegalArgumentException(
            "Pq residual: null vector — filter nulls first")
        val v = row.getSeq[Float](vecIdx)
        val cent = cmap.getOrElse(row.getAs[Number](cIdx).intValue(),
          throw new IllegalArgumentException(
            s"Pq residual: row's cluster ${row.get(cIdx)} is not in " +
              "the passed centroid set — corpus assigned against " +
              "different centroids?"))
        if (v.length != cent.length)
          throw new IllegalArgumentException(
            s"Pq residual: vector dim ${v.length} != centroid dim " +
              s"${cent.length}")
        val r = Array.tabulate(v.length)(j =>
          (v(j).toDouble - cent(j).toDouble).toFloat)
        Row.fromSeq(row.toSeq :+ r.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Residual-PQ fit (FAISS IVFPQ's default): train the codebooks on
    * `v − centroid(cluster(v))` instead of the raw vectors, so ALL
    * codebook resolution is spent on the within-cluster delta — at
    * equal m the decoded error is smaller and recall at the same
    * (nprobe, refine) is ≥ the raw-vector PQ's (spec-graded on the
    * synthetic corpus). Same deterministic sample + Lloyd mechanism as
    * [[fit]]; requires the IVF layout. */
  def fitResidual(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], clusterIds: Array[Int],
      m: Int, ksub: Int = 16, sampleN: Int = 256, seed: Long = 42L,
      iterations: Int = 10): Codebooks =
    fit(withResidual(assigned, vecCol, centroids, clusterIds, ResidCol),
      idCol, ResidCol, m, ksub, sampleN, seed, iterations)

  /** Encode each row's RESIDUAL (books from [[fitResidual]]) — the
    * original columns, raw vector included, ride through untouched for
    * the exact re-rank; only the m-byte code is added. */
  def encodeResidual(df: DataFrame, vecCol: String, books: Codebooks,
      centroids: Array[Array[Float]], clusterIds: Array[Int]): DataFrame =
    encode(withResidual(df, vecCol, centroids, clusterIds, ResidCol),
      ResidCol, books).drop(ResidCol)

  /** Residual IVF-PQ search: `v − q = (v − cent) − (q − cent)`, so the
    * approximate distance is the ADC between the row's RESIDUAL code
    * and the query's residual against that row's OWN cluster — one
    * [[adcTable]] per probed cluster (nprobe tables, KBs), still m
    * lookups + adds per row, distances comparable across clusters
    * (all approximate ‖v − q‖²). Candidate cut and exact re-rank as
    * [[topKProbed]]. */
  def topKProbedResidual(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      books: Codebooks,
      centroids: Array[Array[Float]],
      clusterIds: Array[Int],
      nprobe: Int,
      refine: Int = 4,
      tieBreak: Option[String] = None,
      rankRoundDp: Option[Int] = None): DataFrame = {
    require(encoded.columns.contains(IvfIndex.ClusterCol),
      s"corpus has no '${IvfIndex.ClusterCol}' column — residual " +
        "IVF-PQ needs the IVF cluster layout")
    require(encoded.columns.contains(CodeCol),
      s"corpus has no '$CodeCol' column — Pq.encodeResidual it first")
    require(k > 0, s"k must be > 0, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(query.length == books.dim,
      s"query has dim ${query.length}, codebooks ${books.dim}")
    require(!books.normalized,
      "Pq.topKProbedResidual: residual coding composes with L2 books " +
        "only — residuals of unit-normalized vectors are not what " +
        "fitResidual trains on")
    val spark = encoded.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val q = query.toArray
    val probes = IvfIndex.probeOrder(centroids, clusterIds, query)
      .take(math.max(1, nprobe))
    val cmap = clusterIds.zip(centroids).toMap
    // the query's residual against each probed cluster — the same
    // double-subtract/float-cast arithmetic the encoder used
    val residQ: Map[Int, Array[Float]] = probes.map { c =>
      val cent = cmap(c)
      c -> Array.tabulate(q.length)(j =>
        (q(j).toDouble - cent(j).toDouble).toFloat)
    }.toMap
    val bc = spark.sparkContext.broadcast((books, residQ))
    val scan = encoded.filter(col(IvfIndex.ClusterCol).isin(probes: _*))
    val narrow = scan.select(col(idCol), col(CodeCol),
      col(IvfIndex.ClusterCol))
    val adSchema = StructType(Seq(narrow.schema.head,
      StructField("__pq_d", org.apache.spark.sql.types.DoubleType)))
    val scored = narrow.mapPartitions { rows =>
      val (b, rq) = bc.value
      val tabs = rq.map { case (c, qr) => c -> adcTable(b, qr) }
      rows.map { row =>
        val tab = tabs(row.getAs[Number](2).intValue())
        Row(row.get(0),
          adcScore(tab, row.getAs[Array[Byte]](1), b.m, b.ksub))
      }
    }(org.apache.spark.sql.Encoders.row(adSchema))
    val cand = scored.orderBy(col("__pq_d"), col(idCol))
      .limit(k * refine)
      .select(idCol).collect().map(_.get(0))
    KnnSearch.topK(
      scan.filter(col(idCol).isin(cand.toSeq: _*)).drop(CodeCol),
      vecCol, query, k, KnnSearch.NativeL2, tieBreak,
      rankRoundDp = rankRoundDp)
  }

  /** Batch IVF-PQ: [[topKProbed]]'s two ADC passes composed with the
    * per-query probe gate — many queries, ONE narrow m-byte code scan,
    * exactly the [[IvfIndex.searchQuantizedBatch]] shape with the SQ8
    * decode swapped for per-query [[adcTable]]s. The approximate pass
    * scans the probe UNION reading only `(id, code, cluster)`, scores a
    * row for query `i` only when its cluster is in query i's own probe
    * set (the bit-packed gate), by `m` lookups into query i's table —
    * the identical partial-sum chain as [[topK]], so per-query results
    * are bit-equal to [[topKProbed]] at the same (nprobe, refine,
    * rankRoundDp, metric) (spec-asserted). Candidates are per-query `k·refine`
    * bounded heaps (unrounded distance, id ties); the exact pass is the
    * shared [[KnnSearch.batchExactRerank]] — broadcast candidate pairs,
    * true L2 over raw vectors, floor-form rounding, per-query rank. At
    * scale: Σ_q nprobe/nlist row-scores over one union scan instead of
    * |queries| separate scans. */
  /** Batch face of the FLAT [[topK]] (the {flat, IVF} × {single,
    * batch} matrix's last open cell, opened for q182's multi-query
    * recall eval): per-query ADC tables built once driver-side
    * (m·ksub doubles per query), ONE narrow (id, code) corpus scan
    * scores every row for every query via the shared per-partition
    * heap pass, then the shared exact re-rank — per query bit-equal
    * to [[topK]] at the same (refine, rankRoundDp) (spec-asserted).
    * `perm` is the OPQ contract of [[topK]]: ADC tables on the
    * permuted queries, exact re-rank untouched. */
  def topKBatch(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      books: Codebooks,
      refine: Int = 4,
      tieBreak: String = "",
      rankRoundDp: Option[Int] = None,
      metric: KnnSearch.Metric = KnnSearch.NativeL2,
      perm: Option[Array[Int]] = None): DataFrame = {
    require(encoded.columns.contains(CodeCol),
      s"corpus has no '$CodeCol' column — Pq.encode it first")
    require(k > 0, s"k must be > 0, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    for (c <- Seq("dist", "query_id", "__qv", "__pq_d"))
      require(!encoded.columns.contains(c),
        s"corpus already has a '$c' column — topKBatch adds it")
    val cosine = requireMetricMatchesBooks(metric, books, "Pq.topKBatch")
    val spark = encoded.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val qSet = KnnSearch.collectQueries(queries, queryIdCol, queryVecCol)
    val tables = qSet.map { q =>
      val qRot = perm.map(p => p.map(i => q._2(i))).getOrElse(q._2)
      adcTable(books,
        if (cosine) IvfIndex.unitNormalize(qRot.toSeq).toArray else qRot)
    }
    val m = books.m
    val ksub = books.ksub
    val scorer = KnnSearch.RawScorer { (row, codeIdx, qi, _) =>
      adcScore(tables(qi), row.getAs[Array[Byte]](codeIdx), m, ksub)
    }
    val qidType = queries.schema(queryIdCol).dataType
    val cand = KnnSearch.topKBatchCollected(
      encoded.select(col(idCol), col(CodeCol)),
      CodeCol, qSet, qidType, k * refine, tieBreak = idCol,
      distCol = "__pq_d", rankRoundDp = None,
      rawScorer = Some(scorer))
      .select(col("query_id"), col(idCol))
    KnnSearch.batchExactRerank(encoded.drop(CodeCol), idCol, vecCol,
      cand, qSet, qidType, k, tieBreak, rankRoundDp, cosine = cosine)
  }

  def topKBatchProbed(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      books: Codebooks,
      centroids: Array[Array[Float]],
      clusterIds: Array[Int],
      nprobe: Int,
      refine: Int = 4,
      tieBreak: String = "",
      rankRoundDp: Option[Int] = None,
      metric: KnnSearch.Metric = KnnSearch.NativeL2): DataFrame = {
    require(encoded.columns.contains(IvfIndex.ClusterCol),
      s"corpus has no '${IvfIndex.ClusterCol}' column — IVF-PQ needs " +
        "the IVF cluster layout (assign + partition first, then encode)")
    require(encoded.columns.contains(CodeCol),
      s"corpus has no '$CodeCol' column — Pq.encode it first")
    require(k > 0, s"k must be > 0, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    // same collision contract as searchQuantizedBatch: the exact pass
    // adds these columns, and a silent overwrite (or an ambiguous-join
    // AnalysisException mid-plan) would corrupt downstream plans
    for (c <- Seq("dist", "query_id", "__qv", "__pq_d"))
      require(!encoded.columns.contains(c),
        s"corpus already has a '$c' column — topKBatchProbed adds it")
    val cosine =
      requireMetricMatchesBooks(metric, books, "Pq.topKBatchProbed")
    val spark = encoded.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val np = math.max(1, nprobe)
    val qSet = KnnSearch.collectQueries(queries, queryIdCol, queryVecCol)
    // cosine: probes rank angularly on the RAW query; the ADC tables
    // build against the unit-normalized one (the single-query
    // dispatch); the exact pass scores true cosine on raw vectors
    val perQueryProbes: Array[Array[Int]] = qSet.map(q =>
      (if (cosine)
         IvfIndex.probeOrderCosine(centroids, clusterIds, q._2.toSeq)
       else IvfIndex.probeOrder(centroids, clusterIds, q._2.toSeq))
        .take(np).toArray)
    val union = perQueryProbes.flatten.distinct.toSeq
    val scan = encoded.filter(col(IvfIndex.ClusterCol).isin(union: _*))
    // per-query ADC tables, built once driver-side (m·ksub doubles per
    // query — KBs) and shipped in the scorer closure; the query INDEX
    // from the heap pass selects the right table without any per-row
    // map lookup
    val tables = qSet.map(q => adcTable(books,
      if (cosine) IvfIndex.unitNormalize(q._2.toSeq).toArray else q._2))
    val m = books.m
    val ksub = books.ksub
    val scorer = KnnSearch.RawScorer { (row, codeIdx, qi, _) =>
      adcScore(tables(qi), row.getAs[Array[Byte]](codeIdx), m, ksub)
    }
    val qidType = queries.schema(queryIdCol).dataType
    val cand = KnnSearch.topKBatchCollected(
      scan.select(col(idCol), col(CodeCol), col(IvfIndex.ClusterCol)),
      CodeCol, qSet, qidType, k * refine, tieBreak = idCol,
      distCol = "__pq_d", rankRoundDp = None,
      gate = Some(KnnSearch.BatchGate(IvfIndex.ClusterCol, perQueryProbes)),
      rawScorer = Some(scorer))
      .select(col("query_id"), col(idCol))
    KnnSearch.batchExactRerank(scan.drop(CodeCol), idCol, vecCol, cand,
      qSet, qidType, k, tieBreak, rankRoundDp, cosine = cosine)
  }

  /** Batch RESIDUAL IVF-PQ — the last cell of the {raw,residual} ×
    * {single,batch} PQ matrix: [[topKProbedResidual]]'s per-(query,
    * probed-cluster) residual ADC tables composed with
    * [[topKBatchProbed]]'s probe-gated shared scan. The tables are
    * keyed (query, cluster) — a row's score for query `i` is m lookups
    * into query i's table FOR THE ROW'S OWN CLUSTER (`v − q =
    * (v − cent) − (q − cent)`, so distances stay comparable across a
    * query's probes) — and the gate guarantees a scored row's cluster
    * is in query i's probe set, so the table lookup is total. Same
    * float-cast residual arithmetic, unrounded (dist, id) candidate
    * heaps, and shared exact re-rank as the single-query path — per
    * query the rows are bit-equal to [[topKProbedResidual]] at the
    * same (nprobe, refine, rankRoundDp) (spec-asserted). L2 books
    * only, the single-query residual contract. */
  def topKBatchProbedResidual(
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      books: Codebooks,
      centroids: Array[Array[Float]],
      clusterIds: Array[Int],
      nprobe: Int,
      refine: Int = 4,
      tieBreak: String = "",
      rankRoundDp: Option[Int] = None): DataFrame = {
    require(encoded.columns.contains(IvfIndex.ClusterCol),
      s"corpus has no '${IvfIndex.ClusterCol}' column — residual " +
        "IVF-PQ needs the IVF cluster layout")
    require(encoded.columns.contains(CodeCol),
      s"corpus has no '$CodeCol' column — Pq.encodeResidual it first")
    require(k > 0, s"k must be > 0, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(!books.normalized,
      "Pq.topKBatchProbedResidual: residual coding composes with L2 " +
        "books only — the single-query topKProbedResidual contract")
    for (c <- Seq("dist", "query_id", "__qv", "__pq_d"))
      require(!encoded.columns.contains(c),
        s"corpus already has a '$c' column — topKBatchProbedResidual " +
          "adds it")
    val spark = encoded.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val np = math.max(1, nprobe)
    val qSet = KnnSearch.collectQueries(queries, queryIdCol, queryVecCol)
    qSet.foreach { case (_, qv) =>
      require(qv.length == books.dim,
        s"query has dim ${qv.length}, codebooks ${books.dim}") }
    val perQueryProbes: Array[Array[Int]] = qSet.map(q =>
      IvfIndex.probeOrder(centroids, clusterIds, q._2.toSeq)
        .take(np).toArray)
    val union = perQueryProbes.flatten.distinct.toSeq
    val scan = encoded.filter(col(IvfIndex.ClusterCol).isin(union: _*))
    val cmap = clusterIds.zip(centroids).toMap
    // (query, probe) → residual ADC table: the query's residual against
    // each of ITS OWN probed clusters, with the encoder's exact
    // double-subtract/float-cast arithmetic — nq·nprobe tables of
    // m·ksub doubles (KBs), shipped once in the scorer closure
    val tables: Array[Map[Int, Array[Array[Double]]]] =
      qSet.zip(perQueryProbes).map { case ((_, qv), ps) =>
        ps.map { c =>
          val cent = cmap(c)
          val qr = Array.tabulate(qv.length)(j =>
            (qv(j).toDouble - cent(j).toDouble).toFloat)
          c -> adcTable(books, qr)
        }.toMap
      }
    val m = books.m
    val ksub = books.ksub
    val scorer = KnnSearch.RawScorer { (row, codeIdx, qi, _) =>
      // row layout below: (id, code, cluster) — cluster at 2, as in
      // topKProbedResidual's narrow scan
      adcScore(tables(qi)(row.getAs[Number](2).intValue()),
        row.getAs[Array[Byte]](codeIdx), m, ksub)
    }
    val qidType = queries.schema(queryIdCol).dataType
    val cand = KnnSearch.topKBatchCollected(
      scan.select(col(idCol), col(CodeCol), col(IvfIndex.ClusterCol)),
      CodeCol, qSet, qidType, k * refine, tieBreak = idCol,
      distCol = "__pq_d", rankRoundDp = None,
      gate = Some(KnnSearch.BatchGate(IvfIndex.ClusterCol, perQueryProbes)),
      rawScorer = Some(scorer))
      .select(col("query_id"), col(idCol))
    KnnSearch.batchExactRerank(scan.drop(CodeCol), idCol, vecCol, cand,
      qSet, qidType, k, tieBreak, rankRoundDp, cosine = false)
  }

  // ---- OPQ: variance-balanced dimension permutation --------------------

  /** OPQ rotation restricted to a PERMUTATION matrix — the
    * eigenvalue-allocation idea of Optimized Product Quantization
    * (Ge et al., CVPR 2013: balance information across the m subspaces
    * before splitting) applied directly to the coordinate dimensions:
    * sort dims by variance, then greedily deal them into the m
    * subspace buckets, each dim landing in the not-yet-full bucket
    * with the smallest variance PRODUCT (the independence-assumption
    * objective of the parametric OPQ solution). A permutation is
    * exactly orthogonal, costs one array reorder per row to apply
    * (never a dim² matmul), exports as a dim-row sidecar a SQL oracle
    * replays verbatim, and — unlike a learned dense rotation — keeps
    * every downstream code path in the engine's replayable-arithmetic
    * regime.
    *
    * Derived ENTIRELY from the exact integer moment cells
    * ([[VectorStats.moments]] — one corpus pass, the same artifact the
    * PCA family consumes): scaled variance per dim is
    * `n·Σqᵢ² − (Σqᵢ)²` in BigInt, bucket products multiply
    * `(var + 1)` in BigInt (the +1 keeps a zero-variance dim from
    * pinning its bucket's product at 0 and absorbing every later
    * dim), so the permutation is a pure integer function of the corpus
    * — no doubles, no RNG, replayable anywhere. Ties: equal variance →
    * lower dim first; equal product → lower bucket index.
    *
    * Returns `perm` where `perm(outPos) = srcDim` — row layout
    * `rotated(p) = v(perm(p))`, subspace `s` owning positions
    * `[s·dsub, (s+1)·dsub)`. */
  def opqPermutation(df: DataFrame, vecCol: String, m: Int): Array[Int] = {
    val cells = VectorStats.moments(df, vecCol)
      .select(col("i"), col("j"), col("s")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    require(cells.getOrElse((-1, -1), 0L) > 0,
      "opqPermutation: empty corpus")
    val n = BigInt(cells((-1, -1)))
    val dim = cells.keys.collect { case (i, -1) if i >= 0 => i }.max + 1
    require(m > 0 && dim % m == 0,
      s"opqPermutation: m=$m must divide dim=$dim")
    val dsub = dim / m
    val varScaled = Array.tabulate(dim) { i =>
      n * BigInt(cells((i, i))) - BigInt(cells((i, -1))).pow(2)
    }
    val order = (0 until dim).sortWith { (a, b) =>
      varScaled(a) > varScaled(b) ||
        (varScaled(a) == varScaled(b) && a < b)
    }
    val buckets = Array.fill(m)(Vector.empty[Int])
    val prod = Array.fill(m)(BigInt(1))
    for (d <- order) {
      val b = (0 until m).filter(buckets(_).length < dsub)
        .minBy(b => (prod(b), b))
      buckets(b) = buckets(b) :+ d
      prod(b) *= (varScaled(d) + 1)
    }
    buckets.flatten
  }

  /** the rotated row — `out(p) = v(perm(p))`, a narrow codegen'd
    * array of getItems (no UDF, no shuffle); null rows stay null so
    * [[encode]]'s null guard still fires with its clear message */
  def permuteCol(vecCol: String, perm: Array[Int]): org.apache.spark.sql.Column =
    when(col(vecCol).isNull, lit(null))
      .otherwise(array(perm.map(i => col(vecCol).getItem(i)): _*))

  /** temp column carrying the permuted vector through an OPQ encode */
  private val OpqVecCol = "__opq_vec"

  // ---- persisted-root CDC lifecycle -----------------------------------

  /** subdirectories of a persisted PQ root ([[writeRoot]]'s layout) */
  private[graft] val DataSubdir = "data"
  private[graft] val BooksSubdir = "books"
  private[graft] val CentroidsSubdir = "centroids"
  private[graft] val MetaSubdir = "_pq_meta"
  private[graft] val PermSubdir = "opq_perm"

  /** A loaded persisted PQ root: the encoded corpus plus everything a
    * CDC batch needs to keep it consistent — the FIXED codebooks, the
    * residual-coding flag, (for the IVF layout) the fixed centroids
    * the rows were assigned against, and (for an OPQ root) the fixed
    * dimension permutation the codes were trained under. */
  final case class PqRoot(path: String, books: Codebooks,
      residual: Boolean,
      ivf: Option[(Array[Array[Float]], Array[Int])],
      perm: Option[Array[Int]] = None) {
    def dataPath: String = s"$path/$DataSubdir"
    def data(spark: SparkSession): DataFrame =
      spark.read.parquet(dataPath)
  }

  /** Build a persisted PQ root from a RAW corpus: assign (IVF layout,
    * when centroids are passed), encode raw or residual with the
    * given books, and lay everything out so the root is
    * SELF-MAINTAINING — `data/` (cluster-partitioned when IVF, so
    * probe filters prune directories), `books/` (the q73-replayable
    * sidecar), `centroids/` + `_pq_meta/` (what [[appendEncoded]]
    * needs to encode a CDC batch identically, without the caller
    * re-supplying — and mis-supplying — the build-time config).
    *
    * This closes the one index family that had no maintenance story
    * (r14 verdict): without it, any CDC batch left the persisted code
    * column stale and every later PQ query either rebuilt from
    * scratch or served retired rows. The reference's index maintains
    * itself on INSERT (reference embedding/doc_embedder.py:90-114);
    * this is that contract for the PQ rung, with the same
    * fixed-artifact trade as [[graft.operators.IvfIndex.appendTo]]:
    * books and centroids NEVER refit on append — codes drift as the
    * corpus distribution does, and a rebuild refreshes both. */
  def writeRoot(spark: SparkSession, path: String, corpus: DataFrame,
      vecCol: String, books: Codebooks, residual: Boolean = false,
      ivf: Option[(Array[Array[Float]], Array[Int])] = None,
      perm: Option[Array[Int]] = None): Unit = {
    import spark.implicits._
    require(!residual || ivf.nonEmpty,
      "writeRoot: residual coding needs the IVF layout — pass ivf")
    require(!(residual && books.normalized),
      "writeRoot: residual coding composes with L2 books only")
    require(!(residual && perm.nonEmpty),
      "writeRoot: OPQ permutation composes with raw or IVF coding, " +
        "not residual (the residual geometry is per-cluster)")
    perm.foreach(p => require(p.length == books.dim &&
      p.sorted.sameElements(0 until books.dim),
      s"writeRoot: perm must be a permutation of 0 until ${books.dim}"))
    val encoded = encodeFor(corpus, vecCol, books, residual, ivf, perm)
    val w = encoded.write.mode(SaveMode.Overwrite)
    ivf match {
      case Some(_) =>
        w.partitionBy(IvfIndex.ClusterCol).parquet(s"$path/$DataSubdir")
      case None => w.parquet(s"$path/$DataSubdir")
    }
    books.write(spark, s"$path/$BooksSubdir")
    ivf.foreach { case (cents, cids) =>
      cids.zip(cents).toSeq
        .map { case (c, v) => (c, v.toSeq) }
        .toDF("cluster_id", "centroid")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/$CentroidsSubdir")
    }
    Seq(residual).toDF("residual")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/$MetaSubdir")
    perm.foreach { p =>
      p.zipWithIndex.map { case (src, pos) => (pos, src) }.toSeq
        .toDF("pos", "src_dim")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/$PermSubdir")
    }
    // a wholesale (re)build replaces every sidecar — drop any cached
    // parse of the old ones
    evictMeta(path)
  }

  /** the one encode dispatch shared by build and append — a CDC batch
    * MUST go through the identical arithmetic as the original build
    * or maintained codes silently diverge from a fresh rebuild. An
    * OPQ permutation rotates the row into a TEMP column; the original
    * vector rides through untouched for the exact re-rank. */
  private def encodeFor(corpus: DataFrame, vecCol: String,
      books: Codebooks, residual: Boolean,
      ivf: Option[(Array[Array[Float]], Array[Int])],
      perm: Option[Array[Int]] = None): DataFrame = {
    def encodePerm(df: DataFrame): DataFrame = perm match {
      case Some(p) =>
        encode(df.withColumn(OpqVecCol, permuteCol(vecCol, p)),
          OpqVecCol, books).drop(OpqVecCol)
      case None => encode(df, vecCol, books)
    }
    ivf match {
      case Some((cents, cids)) =>
        // rows may arrive pre-assigned (reading an IVF root's layout);
        // raw rows get nearest-FIXED-centroid assignment, the appendTo
        // contract. Assignment is on the RAW vector — the permutation
        // only reorders the coordinates the CODES are trained on.
        val assigned =
          if (corpus.columns.contains(IvfIndex.ClusterCol)) corpus
          else IvfIndex.assignToCentroids(corpus, vecCol, cents, cids)
        if (residual) encodeResidual(assigned, vecCol, books, cents, cids)
        else encodePerm(assigned)
      case None => encodePerm(corpus)
    }
  }

  /** REFIT lifecycle — the operator q186 priced but the engine could
    * not run: rebuild a root's quantizer from its CURRENT rows into
    * `destPath`. A maintained root's books go stale as appends drift
    * the corpus distribution ([[appendEncoded]] encodes against the
    * FIXED build-time books by contract); q186 measured the recall
    * gap that opens and when a refit pays — this closes the loop.
    *
    * Family dispatch mirrors the build exactly: cosine books refit
    * normalized, an OPQ root re-derives its permutation from the
    * current rows and refits in the permuted coordinates, a residual
    * root refits over residuals, and an IVF layout keeps its STORED
    * centroids — the quantizer refits, the partition layout does not
    * ([[graft.operators.IvfIndex.rebalance]] owns the centroid
    * lifecycle). Hyperparameters default to the source books' own
    * shape (same m, same ksub), and [[fit]]'s sample is
    * `orderBy(id).limit(n)` — storage order is immaterial — so
    * refitting a maintained root is BIT-EQUAL to a fresh build over
    * the same rows (gate q222 hashes exactly that).
    *
    * Copy-based like [[IvfIndex.compact]]: the live root stays
    * intact until the caller swaps readers — under a versioned
    * layout, [[graft.sources.VersionedRoot.publish]] is that swap.
    * Scale shape: one bounded driver-side sample fit (sampleN rows),
    * one encode pass over the corpus (narrow, per-row), one
    * partitioned write — no corpus-scale shuffle beyond the
    * partitioning the layout already demands. */
  def refitRoot(spark: SparkSession, srcPath: String, destPath: String,
      idCol: String, vecCol: String, sampleN: Int = 256,
      seed: Long = 42L, iterations: Int = 10): Unit = {
    require(new org.apache.hadoop.fs.Path(srcPath) !=
      new org.apache.hadoop.fs.Path(destPath),
      s"refitRoot: src and dest must differ (copy-based, like compact)")
    val src = loadRoot(spark, srcPath)
    val m = src.books.m
    val ksub = src.books.ksub
    val corpus = src.data(spark).drop(CodeCol)
    val perm = src.perm.map(_ => opqPermutation(corpus, vecCol, m))
    val books =
      if (src.residual) {
        val (cents, cids) = src.ivf.getOrElse(throw new IllegalStateException(
          s"refitRoot: residual root $srcPath lost its centroids sidecar"))
        fitResidual(corpus, idCol, vecCol, cents, cids, m, ksub,
          sampleN, seed, iterations)
      } else perm match {
        case Some(p) =>
          fit(corpus.withColumn(OpqVecCol, permuteCol(vecCol, p)),
            idCol, OpqVecCol, m, ksub, sampleN, seed, iterations,
            normalized = src.books.normalized)
        case None =>
          fit(corpus, idCol, vecCol, m, ksub, sampleN, seed, iterations,
            normalized = src.books.normalized)
      }
    writeRoot(spark, destPath, corpus, vecCol, books,
      residual = src.residual, ivf = src.ivf, perm = perm)
  }

  def loadRoot(spark: SparkSession, path: String): PqRoot =
    // stamp every sidecar the parsed root derives from (books, meta,
    // centroids, perm — same rationale as [[load]]): a cross-process
    // rewrite of any of them is a new key, never a stale serve. Four
    // listStatus calls, no Spark job.
    rootMetaCache.computeIfAbsent(
      s"$path|${Seq(BooksSubdir, MetaSubdir, CentroidsSubdir, PermSubdir)
          .map(sub => IvfIndex.fsStamp(spark, s"$path/$sub"))
          .mkString("|")}",
      _ => loadRootUncached(spark, path))

  private def loadRootUncached(spark: SparkSession,
      path: String): PqRoot = {
    val books = load(spark, s"$path/$BooksSubdir")
    val residual = spark.read.parquet(s"$path/$MetaSubdir")
      .collect().head.getBoolean(0)
    val conf = spark.sessionState.newHadoopConf()
    val centPath =
      new org.apache.hadoop.fs.Path(s"$path/$CentroidsSubdir")
    val ivf =
      if (centPath.getFileSystem(conf).exists(centPath)) {
        val rows = spark.read.parquet(centPath.toString).collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1)
        Some((rows.map(_._2), rows.map(_._1)))
      } else None
    val permPath = new org.apache.hadoop.fs.Path(s"$path/$PermSubdir")
    val perm =
      if (permPath.getFileSystem(conf).exists(permPath))
        Some(spark.read.parquet(permPath.toString).collect()
          .map(r => (r.getInt(0), r.getInt(1)))
          .sortBy(_._1).map(_._2))
      else None
    PqRoot(path, books, residual, ivf, perm)
  }

  /** Append RAW rows to a persisted PQ root: encode against the FIXED
    * persisted codebooks (no refit — mirroring
    * [[IvfIndex.appendTo]]'s fixed-centroid contract), assign against
    * the fixed centroids when the root carries the IVF layout, land
    * into the same directory layout, refresh the session listing, and
    * fire the derived-artifact invalidation hooks. Rows must arrive
    * UN-encoded and un-assigned — a pre-assigned row could carry an
    * assignment from different centroids, which would silently break
    * every later probe prune. */
  def appendEncoded(spark: SparkSession, path: String,
      newRows: DataFrame, vecCol: String): Unit = {
    val root = loadRoot(spark, path)
    require(!newRows.columns.contains(CodeCol),
      s"appendEncoded takes RAW rows — input already has '$CodeCol'")
    require(!newRows.columns.contains(IvfIndex.ClusterCol),
      s"appendEncoded takes RAW rows — input already has " +
        s"'${IvfIndex.ClusterCol}' (assignment happens here, against " +
        "the root's own centroids)")
    val encoded = encodeFor(newRows, vecCol, root.books, root.residual,
      root.ivf, root.perm)
    val w = encoded.write.mode(SaveMode.Append)
    root.ivf match {
      case Some(_) =>
        w.partitionBy(IvfIndex.ClusterCol).parquet(root.dataPath)
      case None => w.parquet(root.dataPath)
    }
    spark.catalog.refreshByPath(root.dataPath)
    IvfIndex.fireInvalidated(path)
  }

  /** Targeted deletion from a persisted PQ root — the
    * removed/changed leg of the CDC cycle ([[graft.operators
    * .SnapshotDiff]] → deleteEncoded → [[appendEncoded]]). IVF-layout
    * roots rewrite only the affected cluster directories
    * ([[IvfIndex.partitionScopedDelete]] — per-writer dynamic
    * overwrite, zero-survivor directories removed); flat roots
    * rewrite the data directory. Idempotent; returns the affected
    * partition count (flat: 1 if anything was deleted). */
  def deleteEncoded(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Int = {
    val root = loadRoot(spark, path)
    val n = root.ivf match {
      case Some(_) =>
        IvfIndex.partitionScopedDelete(spark, root.dataPath,
          root.data(spark), Seq(IvfIndex.ClusterCol), idCol, ids)
      case None =>
        IvfIndex.flatDelete(spark, root.dataPath, idCol, ids)
    }
    if (n > 0) IvfIndex.fireInvalidated(path)
    n
  }

  /** Compact a fragmented PQ root into `destPath` (incremental
    * [[appendEncoded]] leaves one file per batch per directory; at
    * scale the small-file COUNT dominates listing + task overhead):
    * one shuffle keyed on the cluster column (IVF layout) with
    * `maxRecordsPerFile` bounding sizes, sidecars copied so the
    * fresh root is [[loadRoot]]-compatible. Copy-compact, never
    * in-place (the [[graft.sources.CorpusStore.copyCompactInto]]
    * non-overlap guard) — swap readers to the fresh root after. */
  def compactRoot(spark: SparkSession, srcPath: String,
      destPath: String, targetRowsPerFile: Long = 500000L): Unit = {
    val root = loadRoot(spark, srcPath)
    root.ivf match {
      case Some(_) =>
        graft.sources.CorpusStore.copyCompactInto(root.data(spark),
          Seq(IvfIndex.ClusterCol), root.dataPath,
          s"$destPath/$DataSubdir", targetRowsPerFile)
      case None =>
        // flat root: no partition key to shuffle on — repartition to
        // ceil(rows / targetRowsPerFile) so the small-file COUNT
        // actually shrinks (r15 verdict: maxRecordsPerFile alone
        // bounds sizes but keeps one output file per input task, so N
        // tiny appends came out as N tiny files); the Hadoop-qualified
        // non-overlap guard is shared with the IVF branch (r15 advice:
        // a raw string comparison let aliased spellings of the same
        // directory through, and the lazy read + Overwrite would then
        // delete the source mid-job)
        graft.sources.CorpusStore.requireDisjointRoots(spark,
          root.dataPath, s"$destPath/$DataSubdir")
        val data = root.data(spark)
        val nFiles = math.max(1L,
          (data.count() + targetRowsPerFile - 1L) / targetRowsPerFile)
        data.repartition(nFiles.toInt)
          .write.mode(SaveMode.Overwrite)
          .option("maxRecordsPerFile", targetRowsPerFile)
          .parquet(s"$destPath/$DataSubdir")
    }
    val conf = spark.sessionState.newHadoopConf()
    for (sub <- Seq(BooksSubdir, CentroidsSubdir, MetaSubdir, PermSubdir)) {
      val src = new org.apache.hadoop.fs.Path(s"$srcPath/$sub")
      if (src.getFileSystem(conf).exists(src)) {
        val dst = new org.apache.hadoop.fs.Path(s"$destPath/$sub")
        require(org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(conf), src, dst.getFileSystem(conf), dst,
          false, conf),
          s"compactRoot: sidecar copy to $dst failed — destPath is " +
            "incomplete; re-run")
      }
    }
  }
}
