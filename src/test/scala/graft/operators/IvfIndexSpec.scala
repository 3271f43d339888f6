package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val embeddings =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private lazy val index =
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8)

  private def queryVecs(n: Int): Seq[Seq[Float]] =
    embeddings.orderBy("vec_id").limit(n)
      .select("embedding").collect().map(_.getSeq[Float](0)).toSeq

  private def exactTopK(q: Seq[Float], k: Int): Set[Long] =
    KnnSearch.topK(embeddings, "embedding", q, k, KnnSearch.L2,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("full-probe IVF search is exact (recall 1.0)") {
    val q = queryVecs(1).head
    val approx = index.search(q, 10, nprobe = index.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx == exactTopK(q, 10))
  }

  test("nprobe=6/8 reaches recall >= 0.95; recall grows with nprobe") {
    val ks = 10
    def meanRecall(nprobe: Int): Double = {
      val rs = queryVecs(10).map { q =>
        val exact = exactTopK(q, ks)
        val approx = index.search(q, ks, nprobe = nprobe,
          tieBreak = Some("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size.toDouble / ks
      }
      rs.sum / rs.size
    }
    val atHalf = meanRecall(index.nlist / 2)
    val atThreeQ = meanRecall(6)
    assert(atThreeQ >= 0.95, s"recall at nprobe=6: $atThreeQ")
    assert(atThreeQ >= atHalf, "recall must be monotone in nprobe")
  }

  test("search probes by the SEARCH metric: cosine probes the angularly-right cluster") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    // Two well-separated clusters: FAR sits along the query direction
    // with a large norm, NEAR is angularly wrong with a small norm. The
    // L2-nearest centroid is NEAR (≈0.9 away vs ≈9 away), but every good
    // cosine hit lives in FAR — an L2-ranked probe at nprobe=1 would
    // spend the whole budget on rows the cosine ranking discards.
    val far = (0L until 20L).map(i =>
      (i, Seq(10f + (i % 5) * 0.1f, (i % 3) * 0.05f)))
    val near = (100L until 120L).map(i =>
      (i, Seq(0.1f + (i % 5) * 0.01f, 0.12f + (i % 3) * 0.01f)))
    val idx = IvfIndex.build((far ++ near).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nlist = 2)
    val q = Seq(1f, 0f)
    // the metrics genuinely disagree on the first probe for this layout
    assert(IvfIndex.probeOrder(idx.centroids, idx.clusterIds, q).head !=
      IvfIndex.probeOrderCosine(idx.centroids, idx.clusterIds, q).head)
    val hits = idx.search(q, 5, nprobe = 1,
        metric = KnnSearch.NativeCosine, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(far.map(_._1).toSet),
      s"cosine search must probe the angularly-aligned cluster, got $hits")
    // and the L2 metric still probes by L2 (NEAR first)
    val l2Hits = idx.search(q, 5, nprobe = 1,
        metric = KnnSearch.NativeL2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(l2Hits.nonEmpty && l2Hits.subsetOf(near.map(_._1).toSet))
  }

  test("sampled-fit build: exact at full probe, recall close to the full fit, narrow assignment") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val sampled = IvfIndex.build(embeddings, "vec_id", "embedding",
      nlist = 8, fitSampleFraction = 0.5)
    // full-probe search is EXACT whatever the centroid quality — the
    // sampling lever cannot cost correctness, only (bounded) recall
    val q = queryVecs(1).head
    val res = sampled.search(q, 10, nprobe = sampled.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // the full corpus is assigned (not just the fit sample), in one
    // NARROW pass — the whole point of sampling the iterative fit
    assert(sampled.assigned.count() == embeddings.count())
    val plan = sampled.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"sampled-fit assignment must be narrow:\n$plan")
    // centroids fitted on half the corpus still prune well: recall at
    // nprobe=6/8 within 0.1 of the full fit's (geometry, not votes)
    def meanRecall(idx: IvfIndex): Double = {
      val rs = queryVecs(10).map { qv =>
        val exact = exactTopK(qv, 10)
        val approx = idx.search(qv, 10, nprobe = 6,
            tieBreak = Some("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size.toDouble / 10
      }
      rs.sum / rs.size
    }
    assert(meanRecall(sampled) >= meanRecall(index) - 0.1,
      "sampled fit must not collapse recall")
  }

  test("SQ8: round-trips, exact when refine covers the scan, recall holds, code-only first pass, survives append+compact") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val tmp = Files.createTempDirectory("graft-ivf-sq8-").toString
    val path = s"$tmp/ivf"
    index.write(path, quantize = true)
    val loaded = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(loaded.sq8Params.nonEmpty, "load must recover the SQ8 grid")
    val q = queryVecs(1).head
    def quantized(idx: IvfIndex, refine: Int) =
      idx.searchQuantized(q, 10, nprobe = 6, refine = refine,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select("vec_id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // refine covering the whole probed scan ⇒ the exact re-rank sees
    // every probed row ⇒ bit-equal to the unquantized probed search
    val exact = loaded.search(q, 10, nprobe = 6,
        metric = KnnSearch.NativeL2, tieBreak = Some("vec_id"),
        rankRoundDp = Some(4))
      .select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(quantized(loaded, refine = 1000) == exact)
    // the production refine margin holds recall against the true top-k
    val rs = queryVecs(10).map { qv =>
      val ex = exactTopK(qv, 10)
      val ap = loaded.searchQuantized(qv, 10, nprobe = loaded.nlist,
          refine = 4, tieBreak = Some("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      ex.intersect(ap).size.toDouble / 10
    }
    assert(rs.sum / rs.size >= 0.9, s"SQ8 recall: ${rs.sum / rs.size}")
    // the approximate pass reads codes, never the float vectors — the
    // 4×-less-bytes point of quantizing (same shape searchQuantized
    // plans internally)
    val (mins, scales) = loaded.sq8Params.get
    val approxPlan = loaded.assigned
      .filter(col(IvfIndex.ClusterCol)
        .isin(loaded.probeOrder(q).take(6): _*))
      .select(col("vec_id"), call_function("graft_sq8_l2sq",
        col("__sq8_code"), KnnSearch.litVec(q),
        typedLit(mins ++ scales)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(40)
      .queryExecution.executedPlan.toString
    assert(approxPlan.contains("PartitionFilters") &&
      !approxPlan.contains("embedding"),
      s"approx pass must scan codes only:\n$approxPlan")
    // appended rows get codes against the FIXED grid (no silent
    // null-code rows invisible to the first pass)...
    val extraQ = embeddings.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val half = Files.createTempDirectory("graft-ivf-sq8h-").toString
    IvfIndex.build(embeddings.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", nlist = 8).write(s"$half/ivf", quantize = true)
    IvfIndex.appendTo(spark, s"$half/ivf",
      embeddings.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
    val grown = IvfIndex.load(spark, s"$half/ivf", "vec_id", "embedding")
    val hit = grown.searchQuantized(extraQ, 1, nprobe = 2, refine = 4,
        tieBreak = Some("vec_id"))
      .select("vec_id").head().getLong(0)
    assert(hit == 1L, "appended rows must be visible to the SQ8 pass")
    // ...and compact carries the SQ8 sidecar to the fresh root
    IvfIndex.compact(spark, path, s"$tmp/ivf2")
    val comp = IvfIndex.load(spark, s"$tmp/ivf2", "vec_id", "embedding")
    assert(comp.sq8Params == loaded.sq8Params,
      "compact must preserve the SQ8 grid")
    assert(quantized(comp, refine = 4) == quantized(loaded, refine = 4))
    // the IN-MEMORY append also encodes codes (a code-less union would
    // fail on the column mismatch — or worse, null-merge invisibly)
    import spark.implicits._
    val qv2 = q.map(x => x * 1.01f)
    val memAppended = loaded.append(
      Seq((99999L, qv2, 0)).toDF("vec_id", "embedding", "label"))
    val memHit = memAppended.searchQuantized(qv2, 1, nprobe = 2,
        refine = 4, tieBreak = Some("vec_id"))
      .select("vec_id").head().getLong(0)
    assert(memHit == 99999L,
      "in-memory-appended rows must be visible to the SQ8 pass")
    // and a LOADED quantized index round-trips through write(): codes
    // and grid both survive, no quantize flag needed
    loaded.write(s"$tmp/ivf-rt")
    val rt = IvfIndex.load(spark, s"$tmp/ivf-rt", "vec_id", "embedding")
    assert(rt.sq8Params == loaded.sq8Params,
      "write() of a quantized index must persist its grid")
    assert(quantized(rt, refine = 4) == quantized(loaded, refine = 4))
  }

  test("SQ8 batch: per-query bit-equal to single-query searchQuantized; " +
      "equals unquantized searchBatch at full refine") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val tmp = Files.createTempDirectory("graft-ivf-sq8b-").toString
    index.write(s"$tmp/ivf", quantize = true)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val queries = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qVecs = queries.orderBy("qid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), col("dist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch == the union of per-query single searches (the probe gate
    // makes each query's rows independent of its batchmates)
    val batch = rows(loaded.searchQuantizedBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, refine = 4, tieBreak = "vec_id",
      rankRoundDp = Some(4)))
    val singles = qVecs.flatMap { case (qid, qv) =>
      loaded.searchQuantized(qv, 5, nprobe = 4, refine = 4,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select("vec_id", "dist").collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles, "batch must be bit-equal to single-query")
    // refine covering the probed scan ⇒ the exact re-rank sees every
    // probed row ⇒ bit-equal to the UNQUANTIZED batch search
    val full = rows(loaded.searchQuantizedBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, refine = 100000, tieBreak = "vec_id",
      rankRoundDp = Some(4)))
    val unquantized = rows(loaded.searchBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, tieBreak = "vec_id", rankRoundDp = Some(4)))
    assert(full == unquantized,
      "full-refine quantized batch must equal the unquantized batch")
  }

  test("SQ8 cosine: a normalized grid serves cosine (single == batch, " +
      "full refine == unquantized), metric-grid mismatches rejected, " +
      "appends encode normalized") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val tmp = Files.createTempDirectory("graft-ivf-sq8cos-").toString
    index.write(s"$tmp/ivf", quantizeNormalized = true)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.sq8Normalized, "load must recover the normalized flag")
    val q = queryVecs(1).head
    // grid-metric contract: L2 on a normalized grid is wrong geometry,
    // cosine on a raw grid likewise — both rejected loudly
    intercept[IllegalArgumentException] {
      loaded.searchQuantized(q, 5, nprobe = 4)
    }
    val rawTmp = Files.createTempDirectory("graft-ivf-sq8raw-").toString
    index.write(s"$rawTmp/ivf", quantize = true)
    val rawLoaded = IvfIndex.load(spark, s"$rawTmp/ivf", "vec_id",
      "embedding")
    intercept[IllegalArgumentException] {
      rawLoaded.searchQuantized(q, 5, nprobe = 4,
        metric = KnnSearch.NativeCosine)
    }
    // single-query == batch, per query
    val queries = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qVecs = queries.orderBy("qid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id"), col("dist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = rows(loaded.searchQuantizedBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, refine = 4, tieBreak = "vec_id",
      rankRoundDp = Some(4), metric = KnnSearch.Cosine))
    val singles = qVecs.flatMap { case (qid, qv) =>
      loaded.searchQuantized(qv, 5, nprobe = 4, refine = 4,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4),
          metric = KnnSearch.Cosine)
        .select("vec_id", "dist").collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles,
      "cosine batch must be bit-equal to single-query")
    // refine covering the probed scan ⇒ bit-equal to the UNQUANTIZED
    // cosine batch (same angular probes, same exact scoring)
    val full = rows(loaded.searchQuantizedBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, refine = 100000, tieBreak = "vec_id",
      rankRoundDp = Some(4), metric = KnnSearch.Cosine))
    val unquantized = rows(loaded.searchBatch(queries, "qid", "qv",
      k = 5, nprobe = 4, tieBreak = "vec_id", rankRoundDp = Some(4),
      metric = KnnSearch.Cosine))
    assert(full == unquantized,
      "full-refine cosine quantized batch must equal unquantized")
    // recall at the production refine margin against the exact cosine
    // top-k (full probe: isolates quantization error from probe error)
    val rs = qVecs.map { case (_, qv) =>
      val ex = KnnSearch.topK(embeddings, "embedding", qv, 10,
          KnnSearch.Cosine, tieBreak = Some("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val ap = loaded.searchQuantized(qv, 10, nprobe = loaded.nlist,
          refine = 4, tieBreak = Some("vec_id"),
          metric = KnnSearch.Cosine)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      ex.intersect(ap).size.toDouble / 10
    }
    assert(rs.sum / rs.size >= 0.9,
      s"SQ8 cosine recall: ${rs.sum / rs.size}")
    // appended rows encode through the SAME normalized grid — visible
    // to the code pass at their true angular position
    val qv2 = q.map(x => x * 1.01f)
    val memAppended = loaded.append(
      Seq((99999L, qv2, 0)).toDF("vec_id", "embedding", "label"))
    val memHit = memAppended.searchQuantized(qv2, 1, nprobe = 2,
        refine = 4, tieBreak = Some("vec_id"),
        metric = KnnSearch.Cosine)
      .select("vec_id").head().getLong(0)
    // qv2 is a pure scaling of q: identical direction, so the nearest
    // cosine neighbor must be either the appended row or an exactly
    // colinear original — assert the appended row surfaces
    assert(memHit == 99999L,
      "normalized-grid append must be visible to the cosine SQ8 pass")
  }

  test("SQ8 composes with component scope: both prunes + code-only pass, parity with scoped exact search") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val tmp = Files.createTempDirectory("graft-ivf-sq8-scope-").toString
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8,
      componentCol = Some("label")).write(s"$tmp/ivf", quantize = true)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.sq8Params.nonEmpty && loaded.componentCol.contains("label"))
    val comps = Seq(1, 3, 5)
    val q = queryVecs(1).head
    // refine covering the scoped probed scan ⇒ bit-equal to the scoped
    // exact search — quantization composes with the component filter
    val wide = loaded.searchQuantized(q, 10, nprobe = 6, refine = 1000,
        tieBreak = Some("vec_id"), components = comps,
        rankRoundDp = Some(4))
      .select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = loaded.search(q, 10, nprobe = 6,
        metric = KnnSearch.NativeL2, tieBreak = Some("vec_id"),
        components = comps, rankRoundDp = Some(4))
      .select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wide == exact)
    // the scoped approx pass prunes BOTH directory levels and reads
    // codes, not floats
    val (mins, scales) = loaded.sq8Params.get
    val plan = loaded.assigned
      .filter(col("label").isin(comps: _*))
      .filter(col(IvfIndex.ClusterCol)
        .isin(loaded.probeOrder(q).take(6): _*))
      .select(col("vec_id"), call_function("graft_sq8_l2sq",
        col("__sq8_code"), KnnSearch.litVec(q),
        typedLit(mins ++ scales)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(40)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(f => f.contains("label") &&
      f.contains(IvfIndex.ClusterCol)), s"both prunes expected: $pf")
    assert(!plan.contains("embedding"),
      s"scoped approx pass must scan codes only:\n$plan")
  }

  test("probe pruning cuts the scanned fraction") {
    val q = queryVecs(1).head
    val probes = index.probeOrder(q).take(2)
    val scanned = index.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*)).count()
    assert(scanned < embeddings.count(),
      s"probing 2/8 clusters must scan a strict subset ($scanned)")
  }

  test("persisted index round-trips and still searches with high recall") {
    val tmp = Files.createTempDirectory("graft-ivf-").toString
    index.write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.nlist == index.nlist)
    // centroids come from the sidecar, so the round-trip is bit-exact —
    // not a lossy mean recomputation
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      index.centroids.map(_.toSeq).toSeq)
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // pruned probe prunes parquet partition DIRECTORIES on the cluster col
    val probes = loaded.probeOrder(q).take(2)
    val plan = loaded.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(IvfIndex.ClusterCol))
  }

  test("searchBatch gates each query to its OWN probes inside the one union scan") {
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = index.searchBatch(qs, "qid", "qv", k = 5, nprobe = 3,
        tieBreak = "vec_id", rankRoundDp = Some(4))
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: per query, exact topK over EXACTLY that query's own
    // probed clusters — NOT the batch union; a query whose result
    // depended on what else was in the batch would have
    // batch-composition-dependent recall
    val single = queryVecs(3).zipWithIndex.flatMap { case (q, i) =>
      val own = index.probeOrder(q).take(3)
      val pruned = index.assigned
        .filter(col(IvfIndex.ClusterCol).isin(own: _*))
      KnnSearch.topK(pruned, "embedding", q, 5, KnnSearch.L2,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select("vec_id").collect().map(r => (i.toLong, r.getLong(0)))
    }.toSet
    assert(batch == single)
    // every hit lies inside its query's own probed clusters
    val clusterOf = index.assigned
      .select(col("vec_id"), col(IvfIndex.ClusterCol))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    queryVecs(3).zipWithIndex.foreach { case (q, i) =>
      val own = index.probeOrder(q).take(3).toSet
      val got = batch.collect { case (qid, v) if qid == i.toLong => v }
      assert(got.forall(v => own.contains(clusterOf(v))),
        s"query $i scored rows outside its own probes")
    }
  }

  test("searchBatch is bit-equal to per-query search, per metric (probe gating)") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    for (metric <- Seq(KnnSearch.L2, KnnSearch.Cosine,
        KnnSearch.InnerProduct)) {
      // the scan covers the probe UNION, but the per-query heaps are
      // GATED on each query's own probe set — so whatever the batch's
      // diversity, every query must reproduce its single-query search
      // bit-for-bit: same rows, same distances, metric-dispatched
      // probes included
      val batch = index.searchBatch(qs, "qid", "qv", k = 5, nprobe = 3,
          tieBreak = "vec_id", rankRoundDp = Some(4), metric = metric)
        .select(col("query_id"), col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val single = queryVecs(3).zipWithIndex.flatMap { case (q, i) =>
        index.search(q, 5, nprobe = 3, metric = metric,
            tieBreak = Some("vec_id"), rankRoundDp = Some(4))
          .select("vec_id", "dist").collect()
          .map(r => (i.toLong, r.getLong(0), r.getDouble(1)))
      }.toSet
      assert(batch == single, s"batch != per-query search for $metric")
    }
  }

  test("searchBatch cosine probes angularly — same disagreeing layout as single-query search") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    // the probeOrder-vs-probeOrderCosine disagreeing layout from the
    // single-query spec: FAR along the query direction (large norm),
    // NEAR angularly wrong (small norm) — an L2-planned batch probe at
    // nprobe=1 would scan only NEAR and lose every cosine hit
    val far = (0L until 20L).map(i =>
      (i, Seq(10f + (i % 5) * 0.1f, (i % 3) * 0.05f)))
    val near = (100L until 120L).map(i =>
      (i, Seq(0.1f + (i % 5) * 0.01f, 0.12f + (i % 3) * 0.01f)))
    val idx = IvfIndex.build((far ++ near).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nlist = 2)
    val queries = Seq((0L, Seq(1f, 0f)), (1L, Seq(5f, 0.1f)))
      .toDF("qid", "qv")
    val hits = idx.searchBatch(queries, "qid", "qv", k = 5, nprobe = 1,
        tieBreak = "vec_id", metric = KnnSearch.Cosine)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(far.map(_._1).toSet),
      s"cosine batch must probe the angularly-aligned cluster, got $hits")
  }

  test("searchBatch over a persisted scoped index prunes BOTH levels and equals per-query scoped search") {
    val tmp = Files.createTempDirectory("graft-ivf-batch-scope-").toString
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8,
      componentCol = Some("label")).write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val comps = Seq(1, 3, 5)
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batchDf = loaded.searchBatch(qs, "qid", "qv", k = 5, nprobe = 3,
      tieBreak = "vec_id", rankRoundDp = Some(4), components = comps)
    // ONE scan, with the component restriction AND the probe union both
    // as parquet PartitionFilters — the batch form keeps the flagship
    // doubly-pruned shape
    val plan = batchDf.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(f => f.contains("label") &&
        f.contains(IvfIndex.ClusterCol)),
      s"batch scan must prune both directory levels, got: $pf\n$plan")
    // and the gate keeps per-query results equal to scoped single search
    val batch = batchDf.select(col("query_id"), col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val single = queryVecs(3).zipWithIndex.flatMap { case (q, i) =>
      loaded.search(q, 5, nprobe = 3, tieBreak = Some("vec_id"),
          components = comps, rankRoundDp = Some(4))
        .select("vec_id", "dist").collect()
        .map(r => (i.toLong, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == single)
  }

  test("append assigns to existing centroids — no refit, appended vectors searchable") {
    val base = embeddings.filter(col("vec_id") % 2 === 0)
    val extra = embeddings.filter(col("vec_id") % 2 === 1)
    val idx = IvfIndex.build(base, "vec_id", "embedding", nlist = 8)
    val appended = idx.append(extra)
    // no refit: centroids and cluster ids are bit-identical
    assert(appended.centroids.map(_.toSeq).toSeq ==
      idx.centroids.map(_.toSeq).toSeq)
    assert(appended.clusterIds.toSeq == idx.clusterIds.toSeq)
    // assignment is narrow: union of two shuffle-free branches
    val aPlan = appended.assigned.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange"), s"append must be narrow:\n$aPlan")
    // full-probe search over the appended index == exact over everything
    val q = queryVecs(1).head
    val res = appended.search(q, 10, nprobe = appended.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // an appended vector finds itself under a narrow probe
    val oddQ = embeddings.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val hit = appended.search(oddQ, 1, nprobe = 2,
        tieBreak = Some("vec_id"))
      .select("vec_id").head().getLong(0)
    assert(hit == 1L)
  }

  test("append surfaces null / dimension-mismatched vectors instead of mis-assigning") {
    import spark.implicits._
    val bad = Seq((9999L, Seq(1f, 2f), 0)).toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      index.append(bad).assigned.collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("IvfIndex.append")), ex.toString)
  }

  test("appendTo extends a persisted index without touching the sidecar") {
    val tmp = Files.createTempDirectory("graft-ivf-append-").toString
    val path = s"$tmp/ivf"
    val base = embeddings.filter(col("vec_id") % 2 === 0)
    val extra = embeddings.filter(col("vec_id") % 2 === 1)
    IvfIndex.build(base, "vec_id", "embedding", nlist = 8).write(path)
    def sidecarListing: Seq[String] = {
      val d = new java.io.File(s"$path/_centroids")
      d.listFiles().filter(_.isFile)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}").sorted.toSeq
    }
    val before = sidecarListing
    IvfIndex.appendTo(spark, path, extra, "vec_id", "embedding")
    assert(sidecarListing == before, "sidecar must be untouched by append")
    val loaded = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(loaded.assigned.count() == embeddings.count())
    // full-probe over the appended persisted index is exact again
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // appended rows live inside the cluster directories: the pruned scan
    // still gets directory-level PartitionFilters
    val probes = loaded.probeOrder(q).take(2)
    val plan = loaded.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(IvfIndex.ClusterCol))
  }

  test("component-scoped index: layout round-trips, scoped search exact, BOTH directory levels pruned") {
    val tmp = Files.createTempDirectory("graft-ivf-comp-").toString
    val cIdx = IvfIndex.build(embeddings, "vec_id", "embedding",
      nlist = 8, componentCol = Some("label"))
    cIdx.write(s"$tmp/ivf")
    // the two-level layout IS the manifest: load recovers the component
    // level from the directory structure, no sidecar field needed
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.componentCol.contains("label"),
      s"load must recover the component level, got ${loaded.componentCol}")
    val comps = Seq(1, 3, 5)
    val q = queryVecs(1).head
    // full-probe scoped search == exact top-k over the scoped corpus —
    // the component restriction is a pure filter, not an approximation
    val scoped = loaded.search(q, 10, nprobe = loaded.nlist,
        tieBreak = Some("vec_id"), components = comps)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactScoped = KnnSearch.topK(
        embeddings.filter(col("label").isin(comps: _*)),
        "embedding", q, 10, KnnSearch.L2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(scoped == exactScoped)
    // the flagship shape: narrow probe + component scope in ONE scan with
    // PartitionFilters on BOTH levels — whole component directories and
    // whole cluster directories inside them are skipped at listing time.
    // rankRoundDp = Some(4) is the driver-entry (q56) form: the rounding
    // is a projection and must not disturb the listing-time prune.
    val plan = loaded.search(q, 10, nprobe = 2,
        tieBreak = Some("vec_id"), components = comps,
        rankRoundDp = Some(4))
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(f => f.contains("label") &&
        f.contains(IvfIndex.ClusterCol)),
      s"scan must prune both directory levels, got: $pf\n$plan")
    // a narrow scoped probe returns ONLY in-scope rows
    val rows = loaded.search(q, 10, nprobe = 2,
        tieBreak = Some("vec_id"), components = comps)
      .select("label").collect().map(_.getInt(0)).toSet
    assert(rows.subsetOf(comps.toSet), s"out-of-scope rows: $rows")
  }

  test("scoped recall at nprobe=6/8 holds against the exact within-scope top-k") {
    val tmp = Files.createTempDirectory("graft-ivf-comp-").toString
    IvfIndex.build(embeddings, "vec_id", "embedding",
      nlist = 8, componentCol = Some("label")).write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val comps = Seq(1, 3, 5)
    val scopedCorpus = embeddings.filter(col("label").isin(comps: _*))
    val ks = 10
    def meanRecall(nprobe: Int): Double = {
      val rs = queryVecs(10).map { q =>
        val exact = KnnSearch.topK(scopedCorpus, "embedding", q, ks,
            KnnSearch.L2, tieBreak = Some("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = loaded.search(q, ks, nprobe = nprobe,
            tieBreak = Some("vec_id"), components = comps)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size.toDouble / ks
      }
      rs.sum / rs.size
    }
    // a scoped top-k is HARDER than the global one at equal nprobe: the
    // within-scope neighbors sit farther out, crossing more cluster
    // boundaries (uniform synthetic data is the worst case — measured
    // 0.94 at 6/8 vs 0.95+ unscoped), so the scoped curve is asserted
    // one probe behind the unscoped test's, still monotone
    val at6 = meanRecall(6)
    val at7 = meanRecall(7)
    assert(at6 >= 0.90, s"scoped recall at nprobe=6: $at6")
    assert(at7 >= 0.95, s"scoped recall at nprobe=7: $at7")
    assert(at7 >= at6, "scoped recall must be monotone in nprobe")
  }

  test("components on an unscoped index raise instead of silently returning out-of-scope rows") {
    val ex = intercept[IllegalArgumentException] {
      index.search(queryVecs(1).head, 10, nprobe = 2,
        components = Seq(1))
    }
    assert(ex.getMessage.contains("componentCol"))
  }

  test("appendTo preserves the two-level layout; appended rows stay scoped-searchable") {
    val tmp = Files.createTempDirectory("graft-ivf-comp-append-").toString
    val path = s"$tmp/ivf"
    val base = embeddings.filter(col("vec_id") % 2 === 0)
    val extra = embeddings.filter(col("vec_id") % 2 === 1)
    IvfIndex.build(base, "vec_id", "embedding",
      nlist = 8, componentCol = Some("label")).write(path)
    IvfIndex.appendTo(spark, path, extra, "vec_id", "embedding")
    val loaded = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(loaded.componentCol.contains("label"),
      "append must not flatten the component level")
    assert(loaded.assigned.count() == embeddings.count())
    // an appended (odd) vector finds itself through a scoped search of
    // its own component — it landed inside the right directories
    val probe = embeddings.filter(col("vec_id") === 1)
      .select(col("embedding"), col("label")).head()
    val hit = loaded.search(probe.getSeq[Float](0), 1, nprobe = 2,
        tieBreak = Some("vec_id"), components = Seq(probe.getInt(1)))
      .select("vec_id").head().getLong(0)
    assert(hit == 1L)
  }

  test("compact: fewer files, identical layout/centroids/results") {
    val tmp = Files.createTempDirectory("graft-ivf-compact-").toString
    val path = s"$tmp/ivf"
    // fragment the root: base write + three appends = up to 4 files per
    // partition directory (the streaming-ingest accumulation pattern)
    val slices = (0 until 4).map(i =>
      embeddings.filter(col("vec_id") % 4 === i))
    IvfIndex.build(slices.head, "vec_id", "embedding", nlist = 8,
      componentCol = Some("label")).write(path)
    slices.tail.foreach(s =>
      IvfIndex.appendTo(spark, path, s, "vec_id", "embedding"))
    def dataFiles(root: String): Seq[java.io.File] = {
      // recurse into partition dirs (they contain '='; the cluster level
      // itself starts with '_'), skip sidecar dirs like _centroids
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory &&
            (!f.getName.startsWith("_") || f.getName.contains("=")))
          f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f)
        else Nil
      walk(new java.io.File(root))
    }
    val before = dataFiles(path).size
    IvfIndex.compact(spark, path, s"$tmp/ivf2")
    val after = dataFiles(s"$tmp/ivf2").size
    assert(after < before, s"compact must cut file count ($before -> $after)")
    val orig = IvfIndex.load(spark, path, "vec_id", "embedding")
    val comp = IvfIndex.load(spark, s"$tmp/ivf2", "vec_id", "embedding")
    // layout, centroids (byte-copied sidecar), rows, and search results
    // all survive the rewrite
    assert(comp.componentCol == orig.componentCol)
    assert(comp.centroids.map(_.toSeq).toSeq ==
      orig.centroids.map(_.toSeq).toSeq)
    assert(comp.assigned.count() == orig.assigned.count())
    val q = queryVecs(1).head
    def hits(i: IvfIndex) =
      i.search(q, 10, nprobe = 3, tieBreak = Some("vec_id"),
          components = Seq(1, 3, 5))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits(comp) == hits(orig))
    // in-place and NESTED compaction are refused, not silently
    // destructive (the overwrite would delete the live source mid-job)
    intercept[IllegalArgumentException] {
      IvfIndex.compact(spark, path, path)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.compact(spark, path, s"$path/nested")
    }
    intercept[IllegalArgumentException] {
      IvfIndex.compact(spark, s"$tmp/ivf2", tmp)
    }
  }

  test("compact(dedupIdCol) collapses the at-least-once duplicate ids") {
    val tmp = Files.createTempDirectory("graft-ivf-dedup-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8)
      .write(path)
    // re-deliver one "batch" — the post-append lock-race window leaves
    // it appended but unmarked, so a restart appends it AGAIN
    val batch = embeddings.filter(col("vec_id") < 20)
    IvfIndex.appendTo(spark, path, batch, "vec_id", "embedding")
    val n = embeddings.count()
    assert(spark.read.parquet(path).count() == n + 20)
    // a plain compact faithfully keeps the duplicates...
    IvfIndex.compact(spark, path, s"$tmp/plain")
    assert(spark.read.parquet(s"$tmp/plain").count() == n + 20)
    // ...and the duplicated id surfaces twice in a top-k near itself
    val qv = embeddings.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val dupHits = IvfIndex.load(spark, s"$tmp/plain", "vec_id",
        "embedding")
      .search(qv, 10, nprobe = 8, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(dupHits.count(_ == 0L) == 2,
      s"expected the duplicated id twice in $dupHits")
    // the dedup compact collapses to one row per id, search is clean
    IvfIndex.compact(spark, path, s"$tmp/dedup",
      dedupIdCol = Some("vec_id"))
    assert(spark.read.parquet(s"$tmp/dedup").count() == n)
    val cleanHits = IvfIndex.load(spark, s"$tmp/dedup", "vec_id",
        "embedding")
      .search(qv, 10, nprobe = 8, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(cleanHits.count(_ == 0L) == 1)
    // a bogus column is refused up front
    intercept[IllegalArgumentException] {
      IvfIndex.compact(spark, path, s"$tmp/bad",
        dedupIdCol = Some("no_such_col"))
    }
  }

  test("compact aborts when a streaming batch commits mid-compact") {
    val tmp = Files.createTempDirectory("graft-ivf-guard-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8)
      .write(path)
    // a marker already present BEFORE compact is a settled batch — the
    // guard must not trip on it
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    def mark(name: String): Unit =
      fs.create(new org.apache.hadoop.fs.Path(
        s"$path/_ingest_log/stream-a/$name"), true).close()
    mark("batch-0")
    IvfIndex.compact(spark, path, s"$tmp/ok")
    assert(IvfIndex.load(spark, s"$tmp/ok", "vec_id", "embedding")
      .assigned.count() == embeddings.count())
    // simulate a batch committing DURING the copy: a listener drops a
    // new marker the moment compact runs its first Spark job — strictly
    // after compact's marker snapshot (taken before the source read),
    // strictly before its final re-list — so the injection is
    // deterministic, not a sleep race. The guard must notice the marker
    // and abort rather than publish a root that silently lost the batch.
    val armedAt = System.currentTimeMillis()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        // the bus is async: ignore stragglers from jobs submitted before
        // this test armed the listener — one delivered between arming
        // and compact's snapshot would put the marker in BOTH listings
        if (js.time >= armedAt) mark("batch-1")
    }
    spark.sparkContext.addSparkListener(listener)
    val ex =
      try intercept[IllegalStateException] {
        IvfIndex.compact(spark, path, s"$tmp/racy")
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(ex.getMessage.contains("MID-COMPACT"), ex.getMessage)
    assert(ex.getMessage.contains("batch-1"), ex.getMessage)
    // the abort must DELETE the fully-formed dest — left on disk it
    // would load as a valid index silently missing the mid-copy batch
    assert(!new java.io.File(s"$tmp/racy").exists(),
      "aborted compact must delete its incomplete destPath")
    // the lock is released on BOTH exits: after the earlier success and
    // after this abort — a leak would freeze every future compact and
    // ingest batch on this root
    assert(!new java.io.File(s"$path/${IvfIndex.CompactLockFile}").exists(),
      "compact must release its lock on success and abort alike")
  }

  test("a held compact lock refuses a second compact until released") {
    val tmp = Files.createTempDirectory("graft-ivf-lock-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8)
      .write(path)
    // a crashed compactor's leftover lock
    val lock = new java.io.File(s"$path/${IvfIndex.CompactLockFile}")
    java.nio.file.Files.writeString(lock.toPath, "pid=0 ts=crashed")
    val ex = intercept[IllegalStateException] {
      IvfIndex.compact(spark, path, s"$tmp/dest")
    }
    assert(ex.getMessage.contains("releaseCompactLock"), ex.getMessage)
    // the refused compact must NOT have deleted someone else's lock
    assert(lock.exists(), "a refused compact must not release a lock " +
      "it does not own")
    IvfIndex.releaseCompactLock(spark, path)
    IvfIndex.compact(spark, path, s"$tmp/dest")
    assert(IvfIndex.load(spark, s"$tmp/dest", "vec_id", "embedding")
      .assigned.count() == embeddings.count())
  }

  test("a centroid sidecar rewritten by another process is re-read, not served stale") {
    // the load-metadata cache keys on a content stamp of the sidecar
    // files (r21 verdict #7 / advice): a root mutated at an UNCHANGED
    // path + generation by a writer this JVM's eviction hooks cannot
    // see must still be observed on the next load
    val tmp = Files.createTempDirectory("graft-ivf-stamp").toString
    index.write(s"$tmp/ivf", quantize = true)
    val first = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val before = first.centroids.map(_.toSeq).toSeq
    // simulate the foreign process: rewrite the DEFAULT sidecar parquet
    // in place, calling NO evict/invalidation hook
    import spark.implicits._
    first.clusterIds.zip(first.centroids).toSeq
      .map { case (c, v) => (c, v.map(_ + 1.0f).toSeq) }
      .toDF("cluster_id", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/ivf/${IvfIndex.CentroidSidecar}")
    val second = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(second.centroids.map(_.toSeq).toSeq ==
      before.map(_.map(_ + 1.0f)),
      "load served the stale cached centroids after a foreign rewrite")
  }

  test("load falls back to per-(cluster,dim) means without a sidecar") {
    val tmp = Files.createTempDirectory("graft-ivf-").toString
    index.write(s"$tmp/ivf")
    // simulate a legacy index: drop the sidecar
    val sidecar = new java.io.File(s"$tmp/ivf/_centroids")
    assert(sidecar.exists(), "write() must produce the centroid sidecar")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(sidecar)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.nlist == index.nlist)
    // recomputed means are the k-means cluster centers up to float error
    loaded.clusterIds.zip(index.clusterIds).foreach { case (a, b) =>
      assert(a == b)
    }
    loaded.centroids.zip(index.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3) }
    }
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
  }

  test("probeOrderCosine ranks on the QUANTIZED key: sub-1e-12 cosine " +
      "noise collapses to the cluster-id tie-break") {
    // c2 = 4·c1 (exact power-of-2 float scale): dot scales by 4 and the
    // norm by 4 with NO new rounding (IEEE scaling by 2^k commutes with
    // add/multiply), so cos(q,c1) and cos(q,c2) are BIT-identical — the
    // degenerate limit of the driver-machine ULP noise that flipped the
    // round-11 probe sets. The quantized keys collide and the ranking
    // MUST fall to ascending cluster id, whatever the input order.
    val c1 = Array(0.25f, 0.55f, -0.15f)
    val c2 = c1.map(_ * 4.0f)
    val q = Seq(0.3f, 0.7f, -0.2f)
    assert(IvfIndex.probeOrderCosine(Array(c2, c1), Array(7, 3), q)
      == Seq(3, 7))
    assert(IvfIndex.probeOrderCosine(Array(c1, c2), Array(3, 7), q)
      == Seq(3, 7))
    // a genuinely different direction still ranks by VALUE, not id:
    // c3 is near-orthogonal to q (far lower cosine), so it sorts last
    // despite the smallest id
    val c3 = Array(-0.7f, 0.3f, -0.01f)
    assert(IvfIndex.probeOrderCosine(Array(c3, c2, c1), Array(1, 7, 3), q)
      == Seq(3, 7, 1))
    // and the key itself is the primitive floor form any engine replays
    assert(IvfIndex.quantizeKey(-0.5) == math.floor(-0.5 * 1e12 + 0.5))
  }

  test("cosine replays survive a PERTURBED k-means fit: batch == " +
      "single == the oracle-arithmetic simulation") {
    // The round-11 driver red came from a machine-dependent fit landing
    // a cosine value on a rounding/probe boundary that the local fit
    // never exercised. Simulate "someone else's machine" by perturbing
    // the fit (sample fraction, seed, nlist) and, for EACH geometry,
    // replaying the full oracle arithmetic in-JVM — sequential per-term
    // folds, the quantized probe key, the floor-form 4-dp rounding,
    // (dist, id) ordering — exactly the DuckDB SQL's op sequence. The
    // engine must match its own replay bit-for-bit under every fit; the
    // arithmetic being identical-by-construction is what makes the
    // DuckDB run on any machine agree too.
    import spark.implicits._
    val dim = 6
    val rnd = new scala.util.Random(1234)
    val corpus = (0L until 240L).map(i =>
      (i, Seq.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)))
    val corpusDf = corpus.toDF("vec_id", "embedding").cache()
    val queries = corpus.take(3)
    val k = 4
    val nprobe = 3

    def fold(xs: Seq[Double]): Double = xs.foldLeft(0.0)(_ + _)
    def negCos(c: Array[Float], q: Seq[Float]): Double = {
      val dot = fold(c.indices.map(j => c(j).toDouble * q(j).toDouble))
      val cn = fold(c.map(x => x.toDouble * x.toDouble).toSeq)
      val qn = fold(q.map(x => x.toDouble * x.toDouble))
      if (qn == 0.0 || cn == 0.0) 0.0
      else -(dot / (math.sqrt(qn) * math.sqrt(cn)))
    }
    def cosDist(v: Seq[Float], q: Seq[Float]): Double = {
      val dot = fold(v.indices.map(j => v(j).toDouble * q(j).toDouble))
      val nv = fold(v.map(x => x.toDouble * x.toDouble))
      val nq = fold(q.map(x => x.toDouble * x.toDouble))
      if (nv == 0.0 || nq == 0.0) 1.0
      else 1.0 - dot / (math.sqrt(nv) * math.sqrt(nq))
    }

    val fits = Seq((1.0, 42L, 5), (0.7, 42L, 5), (0.6, 7L, 4), (1.0, 7L, 3))
    for ((frac, seed, nlist) <- fits) {
      val idx = IvfIndex.build(corpusDf, "vec_id", "embedding",
        nlist = nlist, seed = seed, fitSampleFraction = frac)
      val assignedRows = idx.assigned
        .select("vec_id", "embedding", IvfIndex.ClusterCol)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))

      // oracle-arithmetic simulation, per query
      val expected = queries.flatMap { case (qid, qv) =>
        val probes = idx.centroids.zip(idx.clusterIds)
          .map { case (c, id) =>
            (IvfIndex.quantizeKey(negCos(c, qv)), id)
          }
          .sortBy(identity).map(_._2).take(nprobe).toSet
        assignedRows.filter(r => probes.contains(r._3))
          .map { case (vid, v, _) =>
            (vid, KnnSearch.roundHalfUp(cosDist(v, qv), 1e4))
          }
          .sortBy { case (vid, d) => (d, vid) }.take(k)
          .map { case (vid, d) => (qid, vid, d) }
      }.toSet

      val batch = idx.searchBatch(
          queries.toDF("qid", "qv"), "qid", "qv",
          k = k, nprobe = nprobe, tieBreak = "vec_id",
          rankRoundDp = Some(4), metric = KnnSearch.Cosine)
        .select("query_id", "vec_id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch == expected,
        s"batch != oracle simulation under fit (frac=$frac, seed=$seed, " +
          s"nlist=$nlist)")

      val single = queries.flatMap { case (qid, qv) =>
        idx.search(qv, k, nprobe = nprobe, metric = KnnSearch.NativeCosine,
            tieBreak = Some("vec_id"), rankRoundDp = Some(4))
          .select("vec_id", "dist").collect()
          .map(r => (qid, r.getLong(0), r.getDouble(1)))
      }.toSet
      assert(single == expected,
        s"single-query != oracle simulation under fit (frac=$frac, " +
          s"seed=$seed, nlist=$nlist)")
    }
  }

  test("knnGraph at nprobe = nlist is the exact per-row top-k graph") {
    val g = index.knnGraph(k = 3, nprobe = index.nlist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // brute force for a sample of sources: rank ALL other rows by the
    // same rounded distance + nbr ties
    val all = embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d }.sum)
    val sample = all.take(20)
    sample.foreach { case (src, sv) =>
      val expect = all.filter(_._1 != src)
        .map { case (id, v) => (KnnSearch.roundHalfUp(l2(sv, v), 1e4), id) }
        .sorted.take(3).zipWithIndex
        .map { case ((_, id), i) => (src, (i + 1).toLong, id) }.toSet
      val got = g.filter(_._1 == src)
      assert(got == expect, s"graph row mismatch for src=$src")
    }
  }

  test("knnGraph has no self edges and exactly k rows per source") {
    val g = index.knnGraph(k = 3, nprobe = 2)
    assert(g.filter(col("src") === col("nbr")).count() == 0L)
    val perSrc = g.groupBy("src").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(perSrc == Seq(3L), s"per-source counts: $perSrc")
    assert(g.count() == embeddings.count() * 3)
  }

  test("beamSearch differential: the frame walk equals an independent in-memory walk") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val q = queryVecs(1).head
    val entry = embeddings.agg(max(col("vec_id"))).head().getLong(0)
    val got = index.beamSearch(graph, q, entry, k = 5, beam = 4,
        hops = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // independent reference walk over collected data
    val edges = graph.select("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d(id: Long): Double = {
      val v = vecs(id)
      val s = v.zip(q).map { case (a, b) =>
        val x = a.toDouble - b.toDouble; x * x }.sum
      KnnSearch.roundHalfUp(math.sqrt(s), 1e4)
    }
    var visited = Vector(entry)
    var frontier = Set(entry)
    for (_ <- 0 until 3) {
      val cand = frontier.flatMap(f => edges.getOrElse(f, Set.empty))
        .diff(visited.toSet)
      if (cand.nonEmpty) {
        val top = cand.toSeq.map(id => (d(id), id)).sorted.take(4)
          .map(_._2)
        frontier = top.toSet
        visited = visited ++ top
      } else frontier = Set.empty
    }
    val want = visited.map(id => (d(id), id)).sorted.take(5)
      .map { case (dist, id) => (id, dist) }
    assert(got == want, s"walk mismatch:\n got=$got\nwant=$want")
    // the walk from a far entry must IMPROVE on the entry's own
    // distance (it navigates toward the query)
    assert(got.head._2 < d(entry),
      "beam search failed to navigate closer than its entry point")
  }

  test("coarseEntryBatch equals coarseEntry per query") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val qs = embeddings.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batch = index.coarseEntryBatch(qs, sampleMod = 16)
    val singles = qs.map { case (_, qv) =>
      index.coarseEntry(qv, sampleMod = 16) }
    assert(batch == singles,
      s"batch entries $batch != single entries $singles")
  }

  test("beamSearchBatch is bit-equal per query to the single-query walk") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val qs = embeddings.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val entries = index.coarseEntryBatch(qs, sampleMod = 16)
    val batch = index.beamSearchBatch(graph, qs, entries,
        k = 5, beam = 4, hops = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    qs.zip(entries).foreach { case ((qid, qv), entry) =>
      val single = index.beamSearch(graph, qv, entry, k = 5, beam = 4,
          hops = 2)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      val got = batch.getOrElse(qid, Array.empty).toSeq
      assert(got == single,
        s"query $qid: batch=$got\nsingle=$single")
    }
  }

  test("FILTERED beamSearchBatch is bit-equal per query to the single filtered walk at the same (filter, beamWiden)") {
    // the batch face of the graph-rung filtered contract (q230):
    // routing predicate-blind at the widened beam, filter on the
    // final per-query cut only — exactly the single walk, amortized
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    val qs = embeddings.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val entries = index.coarseEntryBatch(qs, sampleMod = 16)
    val batch = index.beamSearchBatch(graph, qs, entries,
        k = 5, beam = 2, hops = 4, filter = Some(m), beamWiden = 3.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    qs.zip(entries).foreach { case ((qid, qv), entry) =>
      val single = index.beamSearch(graph, qv, entry, k = 5, beam = 2,
          hops = 4, filter = Some(m), beamWiden = 3.0)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      val got = batch.getOrElse(qid, Array.empty).toSeq
      assert(got == single,
        s"query $qid: filtered batch=$got\nsingle=$single")
      assert(got.forall(_._2 % 3 == 1),
        s"query $qid: an ineligible row survived the filtered cut")
    }
  }

  test("hierEntry: carry is monotone, the descent scans fewer rows than the flat coarse layer, and its entry walks to better recall") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    import graft.functions.VectorFunctions  // scalastyle:ignore
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val qs = embeddings.orderBy("vec_id").limit(10)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1))
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d(q: Seq[Float], id: Long): Double = {
      val v = vecs(id)
      math.sqrt(v.zip(q).map { case (a, b) =>
        val x = a.toDouble - b.toDouble; x * x }.sum)
    }
    // (1) carry: the descended entry is never worse than the global
    // top-layer argmin it started from
    val h32 = conv(substring(md5(col("vec_id").cast("string")), 1, 8),
      16, 10).cast("long")
    for (q <- qs) {
      val he = index.hierEntry(q, layers = 2, base = 16, nprobe = 2)
      val topIds = embeddings.filter(h32 % 256L === 0L)
        .select("vec_id").collect().map(_.getLong(0))
      if (topIds.nonEmpty) {
        val topBest = topIds.map(id => (d(q, id), id)).min
        assert(d(q, he) <= topBest._1 + 1e-9,
          s"carry regressed: hier ${d(q, he)} vs top-layer $topBest")
      }
    }
    // (2) scan economy: top layer + probe-pruned lower layer touch
    // fewer rows than q156's flat 1/16 coarse layer
    val probes = index.probeOrder(qs.head).take(2)
    val hierRows = embeddings.filter(h32 % 256L === 0L).count() +
      index.assigned.filter(h32 % 16L === 0L)
        .filter(col(IvfIndex.ClusterCol).isin(probes: _*)).count()
    val flatRows = embeddings.filter(
      conv(substring(md5(col("vec_id").cast("string")), 1, 2), 16, 10)
        .cast("long") % 16L === 0L).count()
    assert(hierRows < flatRows,
      s"descent scanned $hierRows rows vs flat coarse $flatRows")
    // (3) the descended entry seeds a BETTER 2-hop walk than the flat
    // coarse entry on this corpus (measured 0.24 vs 0.08 mean
    // recall@5 — the descent lands inside the query's probe clusters,
    // where the graph neighborhood is navigable toward the query)
    def exact5(q: Seq[Float]): Set[Long] =
      vecs.toSeq.map { case (id, _) => (d(q, id), id) }.sorted.take(5)
        .map(_._2).toSet
    var recH = 0.0; var recC = 0.0
    for (q <- qs) {
      val ex = exact5(q)
      val rh = index.beamSearch(graph, q,
          index.hierEntry(q, layers = 2, base = 16, nprobe = 2),
          5, 4, 2).collect().map(_.getLong(0)).toSet
      val rc = index.beamSearch(graph, q,
          index.coarseEntry(q, sampleMod = 16),
          5, 4, 2).collect().map(_.getLong(0)).toSet
      recH += ex.intersect(rh).size / 5.0
      recC += ex.intersect(rc).size / 5.0
    }
    assert(recH >= recC,
      s"hier-entry walk recall $recH < coarse-entry walk recall $recC")
  }

  test("hierEntryBatch equals hierEntry per query") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val qs = embeddings.orderBy("vec_id").limit(5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batch = index.hierEntryBatch(qs, layers = 2, base = 16,
      nprobe = 2)
    val singles = qs.map { case (_, qv) =>
      index.hierEntry(qv, layers = 2, base = 16, nprobe = 2) }
    assert(batch == singles,
      s"batch entries $batch != single entries $singles")
  }

  test("hierEntry rejects a layer stack deeper than the hash-prefix space") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val q = queryVecs(1).head
    val ex = intercept[IllegalArgumentException] {
      index.hierEntry(q, layers = 9, base = 16)
    }
    assert(ex.getMessage.contains("hash-prefix"))
  }

  test("beamSearchBatch fails loudly on an entry id not in the index") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val qs = embeddings.orderBy("vec_id").limit(1)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val ex = intercept[IllegalArgumentException] {
      index.beamSearchBatch(graph, qs, Seq(-12345L), k = 5, beam = 4,
        hops = 1)
    }
    assert(ex.getMessage.contains("-12345"))
  }

  test("beamSearch fails loudly on an entry id not in the index — " +
      "folded hop-1 check (hops >= 1) and dedicated check (hops = 0)") {
    // r21: the existence check folds into hop 1's scored scan (one
    // fewer job per walk) — the fail-loudly contract must survive on
    // every path: the folded scan, the no-hops walk, and an entry with
    // no graph edges (empty first candidate set)
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val q = queryVecs(1).head
    for (hops <- Seq(0, 1, 2)) {
      val ex = intercept[IllegalArgumentException] {
        index.beamSearch(graph, q, entryId = -77L, k = 5, beam = 4,
          hops = hops)
      }
      assert(ex.getMessage.contains("-77"), s"hops=$hops: $ex")
    }
    // entry absent from the GRAPH too (no out-edges → empty hop-1
    // candidates → the dedicated fallback lookup must still raise)
    val emptyGraph = graph.filter(col("src") === Long.MinValue)
      .localCheckpoint()
    val ex2 = intercept[IllegalArgumentException] {
      index.beamSearch(emptyGraph, q, entryId = -77L, k = 5, beam = 4,
        hops = 2)
    }
    assert(ex2.getMessage.contains("-77"))
  }

  test("knnGraph plans a rank-limit window (WindowGroupLimit), not a full sort, and no cartesian") {
    val plan = index.knnGraph(k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in knnGraph plan:\n$plan")
  }

  test("listDataFiles mirrors Spark's hidden-path rule; purgeFilesNotIn removes exactly the post-snapshot delta") {
    // the r18 recovery-purge bug class: a naive hide-underscore rule
    // hid the __ivf_cluster=N partition dirs and made the purge a
    // silent no-op. Pin Spark's actual rule (dot-prefixed hidden;
    // underscore-prefixed hidden UNLESS the name contains '=') and
    // the purge's file-scoped delta semantics on a constructed tree.
    import java.nio.file.{Files => JFiles, Paths}
    val tmp = JFiles.createTempDirectory("graft-listfiles-").toString
    def put(rel: String): Unit = {
      val p = Paths.get(tmp, rel)
      JFiles.createDirectories(p.getParent)
      JFiles.write(p, Array[Byte](1))
    }
    put("__ivf_cluster=0/part-a.parquet")
    put("__ivf_cluster=1/part-b.parquet")
    put("__ivf_cluster=1/.part-b.parquet.crc") // dot-hidden child
    put("top.parquet")
    put("_centroids/x.parquet")    // underscore sidecar: hidden
    put("_ingest_log/a/batch-0")   // marker tree: hidden
    put("_SUCCESS")
    val root = new org.apache.hadoop.fs.Path(tmp)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val snap = IvfIndex.listDataFiles(fs, root)
    assert(snap == Set("__ivf_cluster=0/part-a.parquet",
      "__ivf_cluster=1/part-b.parquet", "top.parquet"))
    // a crashed append lands files in an existing AND a new dir
    put("__ivf_cluster=0/part-crash.parquet")
    put("__ivf_cluster=2/part-crash2.parquet")
    assert(IvfIndex.purgeFilesNotIn(spark, tmp, snap) == 2)
    assert(IvfIndex.listDataFiles(fs, root) == snap,
      "the purge restores exactly the snapshot")
    // sidecars and markers are untouched by the purge
    assert(JFiles.exists(Paths.get(tmp, "_centroids/x.parquet")))
    assert(JFiles.exists(Paths.get(tmp, "_ingest_log/a/batch-0")))
    // idempotent: nothing left to remove
    assert(IvfIndex.purgeFilesNotIn(spark, tmp, snap) == 0)
  }

  test("rebalance: sabotage-then-repair — skew drops, rows preserved, search exact at full probe, contracts survive") {
    // SABOTAGE: a deliberately under-fit root (nlist = 2 — both cells
    // ~15× the target size, the mega-cell shape q206 diagnoses).
    // REPAIR: rebalance(maxCellRows = n/6) must split both cells via
    // sub-fit k-means, retire their ids, and leave a plain IVF whose
    // search/append/delete contracts hold verbatim.
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-rebal-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(path)
    val before = spark.read.parquet(path)
      .groupBy(col(IvfIndex.ClusterCol)).count()
      .collect().map(_.getLong(1))
    val maxCell = n / 6
    assert(before.max > maxCell, "sabotage must be oversized")

    val nSplit = IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = maxCell)
    // every initially-oversized cell split at least once (later passes
    // may re-split uneven sub-cells — k-means does not balance)
    assert(nSplit >= before.count(_ > maxCell),
      s"expected >= ${before.count(_ > maxCell)} splits, got $nSplit " +
        s"(sizes ${before.toSeq})")

    val after = IvfIndex.load(spark, path, "vec_id", "embedding")
    // rows preserved exactly: same count, every id exactly once
    assert(after.assigned.count() == n)
    assert(after.assigned.groupBy("vec_id").count()
      .filter(col("count") > 1).isEmpty, "no id may duplicate")
    // the skew measurably drops: every cell smaller than the old max,
    // and the cell count grew (2 → ceil-split sub-cells)
    val sizesAfter = after.assigned
      .groupBy(col(IvfIndex.ClusterCol)).count()
      .collect().map(_.getLong(1))
    assert(sizesAfter.max <= maxCell,
      s"rebalance must converge on this corpus (distinct points): " +
        s"largest ${sizesAfter.max} > target $maxCell")
    assert(after.nlist > 2)
    // the split ids are retired: sidecar ids == directory ids
    val dirIds = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory &&
        f.getName.startsWith(s"${IvfIndex.ClusterCol}="))
      .map(_.getName.split("=")(1).toInt).toSet
    assert(dirIds == after.clusterIds.toSet,
      s"sidecar/layout drift: $dirIds vs ${after.clusterIds.toSet}")
    // search parity with a fresh index: at full probe BOTH are the
    // exact top-k, so the repaired root hash-equals fresh by equaling
    // the same exact truth
    val q = queryVecs(1).head
    val res = after.search(q, 10, nprobe = after.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // append contract: a new row assigns against the NEW sidecar and
    // is immediately searchable
    import spark.implicits._
    val novelVec = q.map(x => x + 0.0001f)
    IvfIndex.appendTo(spark, path,
      Seq((9999999L, novelVec)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val reloaded = IvfIndex.load(spark, path, "vec_id", "embedding")
    // query WITH the appended vector: its own row (dist 0) must win
    val hit = reloaded.search(novelVec, 1, nprobe = 2,
        tieBreak = Some("vec_id"))
      .select("vec_id").head().getLong(0)
    assert(hit == 9999999L, s"appended row must win the probe, got $hit")
    // idempotent: a balanced root is untouched
    assert(IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = maxCell) == 0)
    // the lock is released — a follow-up compact can take it
    assert(!new java.io.File(s"$path/${IvfIndex.CompactLockFile}")
      .exists())
  }

  test("rebalance preserves the TWO-LEVEL component layout: split cells stay scoped, both prunes survive, scoped search exact") {
    // a cluster's rows span every component directory — splitting it
    // must rewrite label=*/__ivf_cluster=cid across ALL components
    // (the clusterDirs walker's depth-1 case) and keep the component
    // prune intact for later scoped searches
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-rebal-scoped-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2,
      componentCol = Some("label")).write(path)
    val nSplit = IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = n / 6)
    assert(nSplit >= 1)
    val after = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(after.componentCol.contains("label"),
      "the two-level layout must survive the rebalance")
    assert(after.assigned.count() == n)
    assert(after.assigned.groupBy("vec_id").count()
      .filter(col("count") > 1).isEmpty)
    // the retired ids are gone from EVERY component directory
    val clusterDirIds = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("label="))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory &&
        f.getName.startsWith(s"${IvfIndex.ClusterCol}="))
      .map(_.getName.split("=")(1).toInt).toSet
    assert(clusterDirIds == after.clusterIds.toSet,
      s"layout/sidecar drift: $clusterDirIds vs ${after.clusterIds.toSet}")
    // scoped + full-probe search answers the exact within-scope top-k
    val comp = embeddings.filter(col("vec_id") === 0)
      .select("label").head().getInt(0)
    val q = queryVecs(1).head
    val res = after.search(q, 10, nprobe = after.nlist,
        tieBreak = Some("vec_id"), components = Seq(comp))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val truth = KnnSearch.topK(
        embeddings.filter(col("label") === comp), "embedding", q, 10,
        KnnSearch.L2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == truth)
    // both directory levels still prune on the rebalanced layout
    val probes = after.probeOrder(q).take(2)
    val plan = after.assigned
      .filter(col("label") === comp &&
        col(IvfIndex.ClusterCol).isin(probes: _*))
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(f => f.contains(IvfIndex.ClusterCol) &&
      f.contains("label")), s"both levels must prune:\n$plan")
  }

  test("rebalance of a QUANTIZED root: stored SQ8 codes ride through byte-for-byte, searchQuantized parity holds") {
    // the r19-advice unpinned claim: the docstring says codes are
    // row-scoped data that a cell change never re-encodes — prove it.
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-rebal-sq8-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(path, quantize = true)
    def codesById(): Map[Long, Seq[Byte]] =
      spark.read.parquet(path)
        .select(col("vec_id"), col(IvfIndex.Sq8CodeCol))
        .collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val sq8ParamsBefore = spark.read
      .parquet(s"$path/${IvfIndex.Sq8Sidecar}").collect().toSeq.toString
    val codesBefore = codesById()
    assert(IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = n / 6) >= 1)
    assert(codesById() == codesBefore,
      "every stored SQ8 code must survive the reassignment write " +
        "byte-for-byte")
    assert(spark.read.parquet(s"$path/${IvfIndex.Sq8Sidecar}")
      .collect().toSeq.toString == sq8ParamsBefore,
      "the SQ8 grid sidecar is never touched")
    // searchQuantized on the rebalanced root: full probe + refine
    // covering the corpus equals the exact truth (same contract the
    // fresh quantized root pins), so parity with fresh holds by
    // equaling the same truth
    val q = queryVecs(1).head
    val after = IvfIndex.load(spark, path, "vec_id", "embedding")
    val res = after.searchQuantized(q, 10, nprobe = after.nlist,
        refine = (n / 10).toInt + 1, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
  }

  test("rebalance publishes the sidecar ATOMICALLY: pointer generation layout, bounded history, load/autoprobe resolve it") {
    // the r19 verdict #1 window: the old publish overwrote _centroids
    // in place (delete-then-rewrite) — a concurrent lock-free reader
    // could load a half-deleted sidecar. The publish is now a fresh
    // generation dir + one pointer rename; pin the layout mechanics.
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-rebal-atomic-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(path)
    assert(IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = n / 6) >= 1)
    def sidecarGens(): Set[String] =
      new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("_centroids")
          && f.getName != "_centroids_ptr")
        .map(_.getName).toSet
    val ptr = new java.io.File(s"$path/${IvfIndex.CentroidPtr}")
    assert(ptr.isFile, "rebalance must leave a generation pointer")
    val live = new String(java.nio.file.Files.readAllBytes(ptr.toPath),
      "UTF-8").trim
    assert(live.startsWith("_centroids_v"), s"unexpected pointer '$live'")
    assert(sidecarGens().contains(live))
    // bounded history: at most the live generation + two predecessors
    // (keep-2, r21 — TWO full publish cycles of grace for in-flight
    // readers; the r20 one-cycle purge could delete the generation a
    // reader resolved when two publishes landed inside its read window)
    assert(sidecarGens().size <= 3, s"unbounded history: ${sidecarGens()}")
    // readers resolve the pointer: load() serves the repaired layout
    val after = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(after.nlist > 2)
    assert(IvfIndex.resolvedCentroidSidecar(spark, path)
      == s"$path/$live")
    // a wholesale write() makes the DEFAULT sidecar authoritative
    // again — pointer and generations dropped, no stale shadow
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 4)
      .write(path)
    assert(!ptr.exists(), "write() must retire the generation pointer")
    assert(sidecarGens() == Set("_centroids"))
    assert(IvfIndex.load(spark, path, "vec_id", "embedding").nlist == 4)
  }

  test("versioned lifecycles: compactVersioned and rebalanceVersioned publish fresh versions by pointer; the old version stays for rollback") {
    import graft.sources.VersionedRoot
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-vlife-").toString
    val base = s"$tmp/ivf"
    // versioned bases start versioned: first root into v-1, publish
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(VersionedRoot.versionDir(base, 1))
    VersionedRoot.publish(spark, base, 1)
    // an unpointered base is refused by both faces
    intercept[IllegalArgumentException](
      IvfIndex.compactVersioned(spark, s"$tmp/nowhere"))
    intercept[IllegalArgumentException](
      IvfIndex.rebalanceVersioned(spark, s"$tmp/nowhere", "vec_id",
        "embedding", maxCellRows = 10))
    // compact → v-2, published, same rows
    assert(IvfIndex.compactVersioned(spark, base) == 2)
    assert(VersionedRoot.resolve(spark, base) == s"$base/v-2")
    assert(spark.read.parquet(s"$base/v-2").count() == n)
    // rebalance onto a copy → v-3: splits happen on the COPY, v-2
    // keeps its skewed 2-cell layout for instant rollback
    val (v, splits) = IvfIndex.rebalanceVersioned(spark, base,
      "vec_id", "embedding", maxCellRows = n / 6)
    assert(v == 3 && splits >= 1)
    assert(VersionedRoot.resolve(spark, base) == s"$base/v-3")
    val repaired = IvfIndex.load(spark, s"$base/v-3",
      "vec_id", "embedding")
    assert(repaired.nlist > 2 && repaired.assigned.count() == n)
    assert(IvfIndex.load(spark, s"$base/v-2", "vec_id", "embedding")
      .nlist == 2, "the rollback version must keep its old layout")
    // full-probe search on the published version is exact
    val q = queryVecs(1).head
    assert(repaired.search(q, 10, nprobe = repaired.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
      == exactTopK(q, 10))
    // prune keeps rollback headroom: current v-3 + the most recent
    // superseded (v-2); v-1 is reclaimed
    assert(VersionedRoot.prune(spark, base, keep = 1) == Seq(1))
    assert(new java.io.File(s"$base/v-2").exists() &&
      !new java.io.File(s"$base/v-1").exists())
  }

  test("sidecar publish crash recovery: a half-written generation is invisible (pointer untouched) and purged by the next publish; a corrupt pointer fails loudly") {
    val n = embeddings.count()
    val tmp = Files.createTempDirectory("graft-sidecar-crash-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(path)
    // crash simulation: a publish died after writing part of its
    // generation dir, before the pointer rename — readers must keep
    // resolving the default sidecar as if nothing happened
    val torn = new java.io.File(s"$path/_centroids_v7")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(torn.getPath, "part-garbage.parquet"),
      "not parquet")
    assert(IvfIndex.resolvedCentroidSidecar(spark, path)
      == s"$path/_centroids",
      "an unreferenced generation must be invisible to resolution")
    assert(IvfIndex.load(spark, path, "vec_id", "embedding").nlist == 2)
    // the next completed publish (a rebalance pass) purges the torn
    // generation: only the live generation + at most two predecessors
    // remain (keep-2, r21 — the newest superseded generation survives
    // one extra cycle so a reader slower than one publish cycle never
    // loses the directory it resolved; a crashed dir sits ABOVE the
    // live version and is never protected)
    assert(IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = n / 6) >= 1)
    assert(!torn.exists(),
      "the crashed publish's half-written generation must be purged")
    val gens = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_centroids"))
      .map(_.getName).toSet
    assert(gens.size <= 3, s"unbounded sidecar history: $gens")
    // a corrupt pointer is a loud failure, never a silent fallback
    val ptr = java.nio.file.Paths.get(path, IvfIndex.CentroidPtr)
    java.nio.file.Files.writeString(ptr, "garbage")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path, s".${IvfIndex.CentroidPtr}.crc"))
    intercept[IllegalArgumentException](
      IvfIndex.resolvedCentroidSidecar(spark, path))
  }

  test("sidecar publish keeps the predecessor for a full extra cycle (keep-2): two back-to-back publishes never delete the generation a pre-swap reader resolved") {
    // r20 verdict #2 / advice: the old purge kept exactly ONE cycle of
    // grace — a multi-pass rebalance publishing twice in quick
    // succession could delete the directory an in-flight reader had
    // resolved just before the first swap. Keep-2: a generation
    // survives the publish that supersedes it AND the one after.
    val tmp = Files.createTempDirectory("graft-sidecar-keep2-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 2)
      .write(path)
    val cents = spark.read
      .parquet(s"$path/${IvfIndex.CentroidSidecar}").localCheckpoint()
    def live() = IvfIndex.resolvedCentroidSidecar(spark, path)
    val g0 = live() // the default _centroids dir
    // a reader resolves g0 just before the swap...
    IvfIndex.publishCentroids(spark, path, cents) // publish #1
    val g1 = live()
    assert(g1 != g0)
    // ...then a second publish lands while that reader still streams
    // g0 — the old one-cycle purge deleted g0 HERE
    IvfIndex.publishCentroids(spark, path, cents) // publish #2
    val g2 = live()
    assert(g2 != g1)
    assert(new java.io.File(g0).exists(),
      s"keep-2 violated: $g0 deleted within two publish cycles")
    // the THIRD publish finally reclaims g0 (bounded history)
    IvfIndex.publishCentroids(spark, path, cents) // publish #3
    assert(!new java.io.File(g0).exists(),
      s"generation $g0 must age out after two supersessions")
    val gens = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_centroids"))
      .map(_.getName).toSet
    assert(gens.size <= 3, s"unbounded sidecar history: $gens")
    // every publish kept the resolved sidecar loadable end to end
    assert(IvfIndex.load(spark, path, "vec_id", "embedding").nlist == 2)
  }

  test("rebalance recovery: orphan cluster dirs (a crashed run's remnants) are purged, never half-visible") {
    // crash simulation: a sub-cell directory whose id the sidecar does
    // not know (the append-before-swap window). It must be invisible
    // to search (probes rank sidecar ids only) and the next rebalance
    // must purge it.
    val tmp = Files.createTempDirectory("graft-rebal-crash-").toString
    val path = s"$tmp/ivf"
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 4)
      .write(path)
    val n = spark.read.parquet(path).count()
    // fabricate the orphan from real rows under an unknown cluster id
    embeddings.limit(25).select("vec_id", "label", "embedding")
      .write.parquet(s"$path/${IvfIndex.ClusterCol}=77")
    spark.catalog.refreshByPath(path)
    val idx = IvfIndex.load(spark, path, "vec_id", "embedding")
    assert(idx.assigned.count() == n + 25, "orphan rows are on disk")
    // ...but no probe ever selects id 77 (not in the sidecar), so the
    // full-probe search still answers the exact pre-crash truth
    val q = queryVecs(1).head
    val res = idx.search(q, 10, nprobe = idx.nlist,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // a rebalance (even a no-op one) purges the orphan first
    assert(IvfIndex.rebalance(spark, path, "vec_id", "embedding",
      maxCellRows = n) == 0)
    assert(spark.read.parquet(path).count() == n,
      "the crashed run's orphan rows must be purged")
    assert(!new java.io.File(s"$path/${IvfIndex.ClusterCol}=77").exists())
  }

  test("filtered beamSearch: traversal is predicate-blind, the cut is answer-only; beamWiden grows the eligible pool monotonically") {
    // the graph rung of the filtered ladder (r19 verdict #2, the
    // ACORN-1 shape): restricting traversal would disconnect the
    // graph, so the predicate must not change WHICH nodes are walked —
    // only which answers survive.
    val graph = index.knnGraph(k = 3, nprobe = 2, rankRoundDp = 4)
      .localCheckpoint()
    val q = queryVecs(1).head
    val entry = embeddings.agg(max(col("vec_id"))).head().getLong(0)
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    // predicate-blind routing: the filtered walk's answers are EXACTLY
    // the unfiltered walk's visited set cut by the predicate — run the
    // unfiltered walk at a huge k (= the ranked visited set) and
    // filter it driver-side
    val unfilteredVisited = index.beamSearch(graph, q, entry, k = 1000000,
        beam = 4, hops = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = unfilteredVisited.filter(_._1 % 3 == 1).take(5).toSeq
    val got = index.beamSearch(graph, q, entry, k = 5, beam = 4,
        hops = 3, filter = Some(m))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect,
      "filter must cut answers from the SAME walk, never reroute it")
    // beamWiden grows the eligible pool monotonically (ceil(beam·w))
    def poolSize(w: Double): Long =
      index.beamSearch(graph, q, entry, k = 1000000, beam = 2,
        hops = 4, filter = Some(m), beamWiden = w).count()
    val pools = Seq(1.0, 2.0, 4.0).map(poolSize)
    assert(pools == pools.sorted,
      s"widening must never shrink the eligible pool: $pools")
    assert(pools.last > pools.head,
      s"widening must grow the pool somewhere on this corpus: $pools")
    // guards: widen needs a filter; widen < 1 refused
    intercept[IllegalArgumentException](
      index.beamSearch(graph, q, entry, 5, 4, 2, beamWiden = 2.0))
    intercept[IllegalArgumentException](
      index.beamSearch(graph, q, entry, 5, 4, 2, filter = Some(m),
        beamWiden = 0.5))
  }

  test("filtered search: exact at full probe, widening math, selectivity-widened recall recovers the unwidened loss") {
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    def filteredTruth(q: Seq[Float]): Set[Long] =
      KnnSearch.topK(embeddings.filter(m), "embedding", q, 10,
          KnnSearch.L2, tieBreak = Some("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    // at full probe the filtered search IS the exact filtered top-k
    val q = queryVecs(1).head
    val full = index.search(q, 10, nprobe = index.nlist,
        tieBreak = Some("vec_id"), filter = Some(m))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == filteredTruth(q))
    // widening: 1/selectivity probe multiplier, capped at nlist,
    // selectivity validated, meaningless-without-filter rejected
    assert(index.widenedNprobe(2, 1.0 / 3) == 6)
    assert(index.widenedNprobe(4, 0.1) == index.nlist)
    assert(index.widenedNprobe(2, 1.0) == 2)
    intercept[IllegalArgumentException](index.widenedNprobe(2, 0.0))
    intercept[IllegalArgumentException](index.search(q, 10, nprobe = 2,
      filterSelectivity = Some(0.5)))
    // recall vs the FILTERED truth at the ~33% predicate: the widened
    // budget (2/selectivity = 6 probes) must recover at least what
    // the unwidened 2 probes lose
    def meanRecall(sel: Option[Double]): Double = {
      val rs = queryVecs(10).map { qq =>
        val t = filteredTruth(qq)
        val a = index.search(qq, 10, nprobe = 2,
            tieBreak = Some("vec_id"), filter = Some(m),
            filterSelectivity = sel)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        t.intersect(a).size.toDouble / 10
      }
      rs.sum / rs.size
    }
    val unwidened = meanRecall(None)
    val widened = meanRecall(Some(1.0 / 3))
    assert(widened >= unwidened,
      s"widening must not lose recall: $widened < $unwidened")
    assert(widened >= 0.9,
      s"widened filtered recall too low: $widened (unwidened $unwidened)")
  }

  test("filtered search on a persisted root keeps the cluster PartitionFilters with the predicate present") {
    val tmp = Files.createTempDirectory("graft-ivf-filt-").toString
    index.write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val q = queryVecs(1).head
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    val scan = loaded.probedScan(q, nprobe = 2, filter = Some(m))
    val plan = scan.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*__ivf_cluster[^\\]]*\\]".r
      .findFirstIn(plan)
    assert(pf.exists(f => !f.contains("[]")),
      s"predicate must not evict the cluster prune:\n$plan")
    // and search through the same scan answers the filtered truth
    // at full probe
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
        tieBreak = Some("vec_id"), filter = Some(m))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val truth = KnnSearch.topK(embeddings.filter(m), "embedding", q,
        10, KnnSearch.L2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == truth)
  }

  test("filtered searchQuantized: exact filtered truth at full probe; batch face bit-equal per query") {
    val tmp = Files.createTempDirectory("graft-sq8-filt-").toString
    index.write(s"$tmp/ivf", quantize = true)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    val q = queryVecs(1).head
    // full probe + refine covering the filtered corpus → exact
    // filtered truth (the q62 invariant with the predicate inside)
    val n = embeddings.count().toInt
    val res = loaded.searchQuantized(q, 10, nprobe = loaded.nlist,
        refine = n, tieBreak = Some("vec_id"), filter = Some(m))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val truth = KnnSearch.topK(embeddings.filter(m), "embedding", q,
        10, KnnSearch.L2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == truth)
    // batch face parity at the widened partial budget
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = loaded.searchQuantizedBatch(qs, "qid", "qv", k = 5,
        nprobe = 2, refine = 4, tieBreak = "vec_id",
        rankRoundDp = Some(4), filter = Some(m),
        filterSelectivity = Some(1.0 / 3))
      .select(col("query_id"), col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    for (qid <- Seq(0L, 1L, 2L)) {
      val qv = embeddings.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val single = loaded.searchQuantized(qv, 5, nprobe = 2,
          refine = 4, tieBreak = Some("vec_id"), rankRoundDp = Some(4),
          filter = Some(m), filterSelectivity = Some(1.0 / 3))
        .select(col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single,
        s"filtered quantized batch/single divergence for query $qid")
    }
  }

  test("filter composes with component scope: both prunes + the predicate in one scan, exact within scope at full probe") {
    // the reference's full flagship shape — partition_names AND a
    // metadata WHERE AND similarity — in one doubly-pruned, filtered
    // scan on the two-level layout
    val scoped = IvfIndex.build(embeddings, "vec_id", "embedding",
      nlist = 8, componentCol = Some("label"))
    val tmp = Files.createTempDirectory("graft-scope-filt-").toString
    scoped.write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    val comp = embeddings.filter(col("vec_id") === 0)
      .select("label").head().getInt(0)
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
        tieBreak = Some("vec_id"), components = Seq(comp),
        filter = Some(m))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val truth = KnnSearch.topK(
        embeddings.filter(m && col("label") === comp), "embedding", q,
        10, KnnSearch.L2, tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == truth,
      "scoped + filtered full-probe search must be the exact " +
        "filtered within-scope top-k")
    // both directory levels still prune with the predicate present
    val plan = loaded.probedScan(q, nprobe = 2,
        components = Seq(comp), filter = Some(m))
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(f => f.contains(IvfIndex.ClusterCol) &&
      f.contains("label")),
      s"both partition levels must prune:\n$plan")
  }

  test("filtered searchBatch is bit-equal per query to single filtered search at the same widened budget") {
    val m = pmod(col("vec_id"), lit(3L)) === 1L
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = index.searchBatch(qs, "qid", "qv", k = 5, nprobe = 2,
        tieBreak = "vec_id", rankRoundDp = Some(4), filter = Some(m),
        filterSelectivity = Some(1.0 / 3))
      .select(col("query_id"), col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    for (qid <- Seq(0L, 1L, 2L)) {
      val qv = embeddings.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val single = index.search(qv, 5, nprobe = 2,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4),
          filter = Some(m), filterSelectivity = Some(1.0 / 3))
        .select(col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single,
        s"filtered batch/single divergence for query $qid")
    }
  }
}
