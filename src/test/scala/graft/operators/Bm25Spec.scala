package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  test("bm25: relevance ordering, length normalization, independent score check, explode-free plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark join"), // high tf, short
      (2L, "spark"), // tf 1, shortest
      (3L, "filler filler filler filler filler filler filler filler spark"),
      (4L, "join query"),
      (5L, "nothing relevant here") // no query term
    ).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("spark", "join"), k = 10)
    val rows = out.collect().map(r => r.getLong(0) -> r.getDouble(1))
    val score = rows.toMap
    assert(!score.contains(5L), "term-free docs must be dropped")
    assert(rows.head._1 == 1L, s"high-tf short doc must rank first: $rows")
    // same tf, shorter doc wins — the length normalization
    assert(score(2L) > score(3L), s"length norm inverted: $rows")
    // independent recomputation of doc 2 (tf_spark=1, dl=1):
    // N=5, total dl=4+1+9+2+3=19, df_spark=3
    val idfSpark = math.log((5 - 3.0 + 0.5) / (3.0 + 0.5) + 1.0)
    val norm2 = 1.2 * (0.25 + 0.75 * 1.0 / (19.0 / 5))
    val expected2 = idfSpark * (1.0 * 2.2) / (1.0 + norm2)
    assert(math.abs(score(2L) - expected2) <= 1e-4,
      s"doc2 score ${score(2L)} != expected $expected2")
    // scale shape, asserted on the REAL parquet corpus (a 5-row local
    // relation plans differently): per-row HOF tf counts — no explode,
    // so no Generate node and no doc×term row blow-up — and the final
    // rank is a top-k heap, not a global sort
    val plan = Bm25.topK(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", Seq("spark", "join"), k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"explode in bm25 plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bm25: precomputed stats path is bit-identical to the fresh-stats path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("spark", "join", "query")
    val cs = Bm25.stats(docs, "doc_id", "text", terms)
    assert(cs.n > 0 && terms.forall(cs.df.contains))
    def rows(pre: Option[Bm25.CorpusStats]) =
      Bm25.topK(docs, "doc_id", "text", terms, k = 10, precomputed = pre)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(Some(cs)) == rows(None),
      "served-stats scoring must equal the fresh-stats scoring")
    // stats for a term the query set lacks are rejected up front
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq("spark", "unseen-term"),
        k = 5, precomputed = Some(cs))
    }
  }

  test("bm25: duplicate terms rejected, empty corpus yields empty result") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq("a", "a"), k = 5)
    }
    val empty = docs.filter("doc_id < 0")
    assert(Bm25.topK(empty, "doc_id", "text", Seq("a"), k = 5)
      .collect().isEmpty)
  }

  test("bm25 batch: per-query bit-equal to single-query topK; one " +
      "stats pass over the union vocabulary; guards") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val qs = Seq(
      10 -> Seq("spark", "query", "join"),
      11 -> Seq("table", "window", "agg"),
      12 -> Seq("data", "fast", "join"),
      13 -> Seq("zzz_nonexistent_term", "spark"))
    val batch = Bm25.topKBatch(docs, "doc_id", "text",
        qs.toDF("qid", "terms"), "qid", "terms", k = 5)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    // single-query replays: the UNION-vocabulary stats restricted to
    // each query's own terms equal per-query stats (df/N/total are
    // per-term and corpus-global), so topK with its own fresh stats
    // must match bit-for-bit
    val singles = qs.flatMap { case (qid, ts) =>
      Bm25.topK(docs, "doc_id", "text", ts, k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles, "batch must be bit-equal to per-query topK")
    // exactly ONE stats job for the whole batch: count the aggregation
    // passes indirectly — precomputed stats must also serve the batch
    val vocab = qs.flatMap(_._2).distinct
    val cs = Bm25.stats(docs, "doc_id", "text", vocab)
    val viaPre = Bm25.topKBatch(docs, "doc_id", "text",
        qs.toDF("qid", "terms"), "qid", "terms", k = 5,
        precomputed = Some(cs))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPre == batch, "precomputed stats must not change results")
    // guards: empty query set, empty terms, duplicate terms, missing
    // precomputed df
    intercept[IllegalArgumentException] {
      Bm25.topKBatch(docs, "doc_id", "text",
        Seq.empty[(Int, Seq[String])].toDF("qid", "terms"),
        "qid", "terms", k = 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topKBatch(docs, "doc_id", "text",
        Seq(1 -> Seq.empty[String]).toDF("qid", "terms"),
        "qid", "terms", k = 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topKBatch(docs, "doc_id", "text",
        Seq(1 -> Seq("a", "a")).toDF("qid", "terms"),
        "qid", "terms", k = 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topKBatch(docs, "doc_id", "text",
        Seq(1 -> Seq("missing")).toDF("qid", "terms"),
        "qid", "terms", k = 5, precomputed = Some(cs))
    }
  }

  test("postingsExport digests match hand-built postings strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (10L, "alpha beta alpha"),
      (3L, "beta gamma"),
      (25L, "alpha")
    ).toDF("doc_id", "text")
    val r = Bm25.postingsExport(docs, "doc_id", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // alpha: docs 3? no — docs 10 (tf 2) and 25 (tf 1), sorted by id
    val a = r("alpha")
    assert(a.getLong(1) == 2L && a.getLong(2) == 3L && a.getLong(3) == 2L)
    assert(a.getLong(4) == 10L && a.getLong(5) == 25L)
    assert(a.getString(6) == md5hex("10:2,25:1"))
    assert(a.getString(7) == md5hex("10,15")) // gap-encoded
    // beta: docs 3 and 10
    assert(r("beta").getString(6) == md5hex("3:1,10:1"))
    assert(r("beta").getString(7) == md5hex("3,7"))
    // gamma: df = 1 — the delta string is just the first id (the
    // sequence(2,1)-descends guard)
    assert(r("gamma").getLong(1) == 1L)
    assert(r("gamma").getString(7) == md5hex("3"))
  }

  test("sharded postings recompose: df/cf sums match the unsharded export, deltas restart per shard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val docs = (0L until 40L).map(i => (i, s"common t${i % 4}"))
      .toDF("doc_id", "text")
    val whole = Bm25.postingsExport(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val sharded = Bm25.postingsShardExport(docs, "doc_id", "text", 10L)
    val recomposed = sharded.groupBy("term")
      .agg(fsum("df").as("df"), fsum("cf").as("cf"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(recomposed == whole)
    // 'common' is in every doc: 4 shards of 10 docs each, and each
    // shard's delta digest starts at ITS OWN first doc (independent
    // decode) — all four shards digest the same gap structure
    // (first-of-shard, then nine 1-gaps) with different first ids
    val commons = sharded.filter(col("term") === "common")
      .select("shard", "first_doc", "delta_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(commons.length == 4)
    assert(commons.map(_._2).sorted.toSeq == Seq(0L, 10L, 20L, 30L))
    assert(commons.map(_._3).distinct.length == 4,
      "per-shard delta strings start at different first ids")
  }

  test("postingsExport is layout-invariant") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"t${i % 7} t${i % 3} shared")).toDF("doc_id", "text")
    val a = Bm25.postingsExport(docs.repartition(1), "doc_id", "text")
      .orderBy("term").collect().map(_.toSeq).toSeq
    val b = Bm25.postingsExport(docs.repartition(11), "doc_id", "text")
      .orderBy("term").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
