package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.functions.TextFunctions.{jaccard, wordShinglesNative}
import graft.functions.VectorFunctions.cosineSimilarity
import graft.plans.VectorExpressions

/** Scoped ownership for an in-operator cache: unpersists `target` after
  * the FIRST completed action whose analyzed plan consumed it, then
  * unregisters itself. A long-lived service calling
  * [[NearDup.minhashPairs]] over distinct corpora no longer accumulates
  * MEMORY_AND_DISK entries for the JVM lifetime. A second action on the
  * same returned frame recomputes instead of reading cache — correct,
  * just uncached; the operator's result is meant to be materialized
  * once. Listener delivery is async (the SQL listener bus), so release
  * happens shortly after the action returns, not within it.
  *
  * The listener's own lifetime is bounded too: a frame that is built but
  * never materialized would otherwise leak one registered listener per
  * call for the JVM lifetime, each walking/canonicalizing every
  * completed query's analyzed plan on the listener bus. After
  * `maxMisses` completed actions that did NOT consume the target, the
  * listener gives up, unpersists (a no-op if never computed) and
  * unregisters — the abandoned frame's cache entry goes with it. */
private final class UnpersistAfterFirstAction(
    spark: SparkSession, target: DataFrame,
    watch: Option[DataFrame] = None,
    maxMisses: Int = NearDup.ListenerMaxUnrelatedActions)
    extends QueryExecutionListener {
  // `watch` (default: the target itself) is the frame whose first
  // completed action releases the cache — the pair operators pass
  // their RETURNED frame so that the construction-time candidate
  // checkpoint (which also consumes the shingle cache) cannot release
  // it before the exact-scoring pass has read it (r22).
  private val key =
    watch.getOrElse(target).queryExecution.analyzed.canonicalized
  private val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
  private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
  private def release(): Unit =
    if (armed.compareAndSet(true, false)) {
      target.unpersist()
      spark.listenerManager.unregister(this)
    }
  private def maybeRelease(qe: QueryExecution): Unit =
    if (armed.get()) {
      if (qe.analyzed.exists(_.canonicalized == key)) release()
      else if (misses.incrementAndGet() >= maxMisses) release()
    }
  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = maybeRelease(qe)
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = maybeRelease(qe)
}

/** Near-duplicate detection that scales — the north-star dedup extensions
  * (builder brief) layered on the shingle/jaccard primitives in
  * [[graft.functions.TextFunctions]].
  *
  * The naive formulation (pairwise Jaccard over all documents) is an
  * all-pairs O(n²) cartesian — a non-starter at 100 TB. Here candidate
  * generation is MinHash + LSH banding: only documents sharing a band
  * bucket ever meet in a join, so the shuffle is keyed on bucket hashes
  * (uniform by construction) and exact Jaccard runs on candidate pairs
  * only. Two docs with Jaccard ≥ t collide in ≥1 of b bands with
  * probability 1 − (1 − t^r)^b — with (numHashes=12, bands=4, r=3) and
  * t=0.8 that's ≈ 0.96 recall, tunable per corpus.
  *
  * All hashes are md5-derived (not JVM-specific) so signatures are
  * portable across engines — the DuckDB oracle computes the identical
  * buckets.
  */
object NearDup {

  /** How many completed actions NOT consuming the shingle cache a
    * [[UnpersistAfterFirstAction]] listener tolerates before concluding
    * the frame was abandoned and releasing cache + listener. Small
    * enough that an abandoned call stops taxing the listener bus
    * quickly; large enough that a caller interleaving a few unrelated
    * queries before materializing still gets the cached shingles. */
  private[operators] val ListenerMaxUnrelatedActions = 32

  /** MinHash signature: element i is the minimum md5 of `i|shingle` over
    * the doc's shingles — one independent permutation per salt i.
    * Column form for per-row use; [[minhashPairs]] computes the same
    * signature relationally (explode + min agg), which scales better —
    * nested HOF lambdas referencing the shingle array re-evaluate it per
    * element when interpreted. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** LSH band keys: the signature is cut into `bands` slices of
    * `rowsPerBand`, each hashed; the band index prefixes the key so
    * band 0 and band 1 buckets never collide. */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws("|",
          slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))))

  /** MinHash+LSH near-dup pairs: returns (a_id, b_id, jaccard) for
    * candidate pairs with exact Jaccard ≥ `threshold` (computed on the
    * rounded value for cross-engine determinism).
    *
    * Plan shape: shingle/signature/bucket derivation is narrow; the only
    * wide ops are the bucket equi-join (shuffle keyed on band hashes),
    * the pair `distinct`, and two id-keyed joins to re-fetch shingle sets
    * for exact scoring — pairs are rare, so those joins move candidate
    * ids, not the corpus. No cartesian product anywhere (asserted in
    * NearDupSpec).
    *
    * The (id, shingles) frame feeds THREE subtrees (signatures, a-side
    * re-fetch, b-side re-fetch), so the operator persists it
    * (MEMORY_AND_DISK): tokenization + shingling run once per document
    * instead of three times. The cache's lifetime is OWNED by the
    * operator: a [[UnpersistAfterFirstAction]] listener releases the
    * entry as soon as the first action over the result completes, so a
    * long-lived service calling this over distinct corpora never
    * accumulates JVM-lifetime cache entries. Within that first action
    * Spark's CacheManager still dedupes concurrent same-plan persists.
    * Pass `persistShingles = false` to skip caching entirely (one-shot
    * jobs on corpora larger than cluster storage). */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.8,
      roundDp: Int = 4,
      persistShingles: Boolean = true): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    // driver-side, idempotent: the fused native shingler needs the graft
    // function registry on whatever session owns `docs`
    VectorExpressions.ensureRegistered(docs.sparkSession)
    val sh = ownedShingleCache(
      shingleFrame(docs, idCol, textCol, shingleN), persistShingles)
    // signature natively: graft_minhash computes all numHashes salted-md5
    // minima in ONE narrow pass per row — no shingle explosion, no
    // aggregation shuffle. (History: a nested-HOF formulation re-derived
    // the shingle array per lambda element, 100× slower; the round-3
    // explode → per-salt min agg fixed that but still materialized
    // shingles× rows through a shuffle.)
    val sig = sh.select(col("id"),
      graft.functions.TextFunctions.minhashNative(col("shingles"),
        numHashes).as("sig"))
    val bucketCols = (0 until bands).map { b =>
      concat(lit(s"$b:"), md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)))
    }
    // pin the (id, bucket) frame before the self-join (r22, guide
    // §2.4/§3.3): a self-join's two sides canonicalize with distinct
    // expr ids, so NOTHING above the shingle cache is reused — the
    // whole MinHash signature pass (numHashes salted-md5 minima over
    // every shingle of every doc) ran TWICE per call. The pinned frame
    // is bands rows per doc of (id, 35-char bucket) — narrow, a tiny
    // fraction of the corpus bytes — and the values are identical, so
    // the candidate set is unchanged. Gated on `persistShingles`, the
    // operator's existing storage escape hatch.
    val bucketsRaw = sig
      .select(col("id"), explode(array(bucketCols: _*)).as("bucket"))
    val buckets =
      if (persistShingles) bucketsRaw.localCheckpoint() else bucketsRaw
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val shA = sh.select(col("id").as("a_id"), col("shingles").as("sh_a"))
    val shB = sh.select(col("id").as("b_id"), col("shingles").as("sh_b"))
    releaseAfter(
      pairs.join(shA, "a_id").join(shB, "b_id")
        .select(col("a_id"), col("b_id"),
          round(jaccard(col("sh_a"), col("sh_b")), roundDp).as("jaccard"))
        .filter(col("jaccard") >= threshold),
      sh, persistShingles)
  }

  /** The (id, shingles) frame both pair operators start from: distinct
    * word-`n`-grams per doc via the fused native shingler, empty-shingle
    * docs dropped (they can never pair). ONE definition so the two
    * operators can never diverge on shingle semantics. */
  private def shingleFrame(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        wordShinglesNative(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Operator-owned persist for the (id, shingles) frame feeding several
    * subtrees: MEMORY_AND_DISK, so tokenization + shingling run once.
    * Lifetime is closed by [[releaseAfter]] at the end of the operator
    * (the listener must watch the RETURNED frame, not the cache itself:
    * since r22 the operators run a construction-time candidate
    * checkpoint that also consumes the cache, and that early action
    * must not release it before the exact-scoring pass reads it). */
  private def ownedShingleCache(shRaw: DataFrame,
      persist: Boolean): DataFrame =
    if (!persist) shRaw
    else shRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Register the cache-release listener: unpersist `sh` after the
    * first completed action whose plan contains `result` (or after a
    * bounded number of unrelated actions if the frame is abandoned).
    * Returns `result` for chaining. */
  private def releaseAfter(result: DataFrame, sh: DataFrame,
      persist: Boolean): DataFrame = {
    if (persist)
      result.sparkSession.listenerManager.register(
        new UnpersistAfterFirstAction(result.sparkSession, sh,
          Some(result)))
    result
  }

  /** EXACT n-gram Jaccard near-dup pairs: every pair (a_id < b_id) with
    * word-`shingleN`-gram Jaccard ≥ `threshold` — no approximation,
    * unlike [[minhashPairs]] (MinHash recall < 1) — yet still no
    * all-pairs cartesian.
    *
    * Candidate generation is PREFIX FILTERING (the AllPairs/PPJoin
    * family): each doc's shingle set is ordered under one global total
    * order and only the first `m − ⌈t·m⌉ + 1` of its `m` grams are
    * indexed. Two sets with Jaccard ≥ t overlap in ≥ ⌈t·max(|A|,|B|)⌉
    * elements, so they MUST share at least one gram inside those
    * prefixes — ANY total order makes the candidate set a superset of
    * all true pairs, and exact scoring keeps precision.
    *
    * The order is corpus DOCUMENT FREQUENCY ascending (ties by gram) —
    * the AllPairs heuristic, and at scale the difference between this
    * operator working and degenerating: prefixes then hold each doc's
    * RAREST grams, so a prefix gram is shared by few docs and the
    * candidate join stays sparse. (A frequency-oblivious order — e.g.
    * hashing the gram — is just as CORRECT but puts boilerplate grams
    * into the prefix of every doc containing them: one hot key turns
    * the join quadratic, measured 22× slower on the benchmark corpus.)
    * Candidates are further cut by the PPJoin length filter:
    * J(A,B) ≥ t forces t·max(|A|,|B|) ≤ |A∩B| ≤ min(|A|,|B|), so
    * mismatched-size pairs drop before scoring. The df aggregation and
    * join are gram-keyed with scalar buffers — hot grams cost a count,
    * never a value list.
    *
    * The ⌈t·m⌉ is computed as `ceil(t·m − 1e-9)`: binary Double noise
    * (0.8·10 = 8.000000000000002) must never round the required overlap
    * UP — a too-large overlap bound would shorten the prefix and drop
    * true pairs; the epsilon can only lengthen the prefix, which costs
    * candidates but never correctness. The length filter subtracts the
    * same epsilon so it can only admit extra candidates, never drop a
    * true pair. */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      roundDp: Int = 4,
      persistShingles: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    VectorExpressions.ensureRegistered(docs.sparkSession)
    val sh = ownedShingleCache(
      shingleFrame(docs, idCol, textCol, shingleN), persistShingles)
    // rarest-first prefix: rank each doc's grams by corpus df (the
    // native shingler emits distinct grams per doc, so count = df),
    // keep ranks within the prefix length
    val grams = sh.select(col("id"), size(col("shingles")).as("m"),
      explode(col("shingles")).as("gram"))
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("gram"))
    // pin the prefix frame before the self-join (r22, guide §2.4/§3.3):
    // the self-join's sides canonicalize with distinct expr ids, so the
    // ENTIRE prefix derivation — the corpus gram explode, the
    // document-frequency aggregation (a corpus-gram-keyed shuffle), and
    // the per-doc rank window — ran TWICE per call
    // (plans/r22/q53_jaccard_pairs_before.txt: operators 8-24 ≡ 25-44).
    // The pinned frame holds only each doc's PREFIX grams
    // (m − ⌈t·m⌉ + 1 rows per doc ≈ (1−t) of the gram stream, narrow
    // rows), values identical → same candidate superset. Gated on
    // `persistShingles`, the operator's storage escape hatch.
    val prefixesRaw = grams.join(dfreq, "gram")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <=
        col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)).cast("int")
          + 1)
      .select(col("id"), col("m"), col("gram"), col("rk"))
    val prefixes =
      if (persistShingles) prefixesRaw.localCheckpoint() else prefixesRaw
    // POSITIONAL filtering on top of the prefix join (PPJoin, Xiao et
    // al. 2008; r21 verdict #3, guide §3 join-input reduction): a
    // shared gram at ranks (ra, rb) of the SAME global order bounds the
    // overlap above by 1 + min(|A|−ra, |B|−rb), and J(A,B) ≥ t forces
    // overlap ≥ t/(1+t)·(|A|+|B|); a gram occurrence whose bound can't
    // reach that requirement generates no candidate. Never drops a true
    // pair: for the FIRST common gram in the global order, every
    // earlier gram of either doc is outside the intersection, so the
    // bound holds with room — that occurrence always passes (and it is
    // inside both prefixes, the classical prefix-filter guarantee).
    // The same 1e-9 goes DOWN on the required-overlap side as on the
    // prefix length: binary Double noise may only ADMIT candidates.
    // Exact scoring below is untouched, so the result set is identical
    // — only the candidate superset shrinks.
    val reqOverlap = ceil(
      lit(threshold / (1.0 + threshold)) *
        (col("a.m") + col("b.m")).cast("double") - lit(1e-9))
    val pairs = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
          least(col("a.m"), col("b.m")).cast("double") >=
            lit(threshold) * greatest(col("a.m"), col("b.m")) - lit(1e-9) &&
          (lit(1L) + least(col("a.m") - col("a.rk"),
            col("b.m") - col("b.rk"))).cast("double") >= reqOverlap)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val shA = sh.select(col("id").as("a_id"), col("shingles").as("sh_a"))
    val shB = sh.select(col("id").as("b_id"), col("shingles").as("sh_b"))
    // threshold on the UNROUNDED jaccard, round only for display: the
    // prefix/length filters guarantee candidates for TRUE J ≥ t, so a
    // rounded filter would admit pairs with true J ∈ [t − 5e-5, t) that
    // the filter never promised to generate — on a large-union doc that
    // would silently break "hash equality IS the exactness proof". Both
    // sides divide the same two integers (|A∩B| / |A∪B|), so the
    // unrounded comparison is IEEE-identical cross-engine.
    releaseAfter(
      pairs.join(shA, "a_id").join(shB, "b_id")
        .select(col("a_id"), col("b_id"),
          jaccard(col("sh_a"), col("sh_b")).as("__j"))
        .filter(col("__j") >= threshold)
        .select(col("a_id"), col("b_id"),
          round(col("__j"), roundDp).as("jaccard")),
      sh, persistShingles)
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair graph, each doc labeled with the MINIMUM doc id reachable from
    * it — the cluster representative. Real curation keeps one doc per
    * CLUSTER; dropping the higher id of every pair (q54's greedy) can
    * drop both docs of a pair whose ids are each dominated elsewhere,
    * while clustering keeps exactly one representative however tangled
    * the duplicate graph is.
    *
    * Distributed min-label propagation WITH POINTER JUMPING: every node
    * starts labeled with itself; each round every node takes the min of
    * its own label, its neighbors' labels, and its current
    * representative's label (rep-of-rep — one extra pairs-sized
    * self-join that makes label distances double per round, so
    * convergence is O(log diameter) rounds, not O(diameter); a 1000-doc
    * boilerplate CHAIN converges in ~10 rounds instead of ~1000).
    * Rounds run as id-keyed shuffles over the PAIR graph — pairs-sized,
    * not corpus-sized: at 100 TB the corpus never enters this loop, only
    * the near-dup edges (rare by construction). Convergence detection is
    * a scalar: labels are monotone non-increasing, so sum(rep) strictly
    * decreases until the fixpoint — one tiny aggregate per round, no
    * old-vs-new join (decimal sum: a long would wrap silently on a huge
    * graph and could fake a fixpoint). `maxIter` is the pathological
    * backstop and raises rather than returning half-propagated labels.
    *
    * Every iteration boundary is an EAGER `localCheckpoint`, not a
    * persist: persist short-circuits execution but every derived plan
    * still EMBEDS the full upstream tree (here: the whole MinHash
    * pipeline), so analysis + optimization re-walk a growing plan each
    * round — measured as 3× the actual compute on this operator.
    * Checkpointing truncates the plan to a flat scan of materialized
    * partitions, so round plans stay O(1) deep forever. Superseded
    * round RDDs become unreferenced on reassignment and Spark's
    * ContextCleaner releases them; the final round's partitions back
    * the returned frame and are likewise GC-released when the caller
    * drops it. (localCheckpoint trades executor-loss recovery for
    * speed — on executor loss the job fails and the caller reruns,
    * the right trade for a pairs-sized working set.) */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 32): DataFrame = {
    // ids must already be integral: a silent cast of string/UUID ids
    // would turn every id into null and return one garbage row instead
    // of failing — loud beats wrong, as everywhere in this operator set
    Seq(aCol, bCol).foreach { c =>
      val dt = pairs.schema(c).dataType
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"duplicateClusters: column '$c' must be an integral id type, " +
          s"got ${dt.simpleString} — map ids to longs first")
    }
    // both directions from ONE pass over the pairs plan — a union of two
    // selects would execute the (possibly expensive) pairs subtree
    // twice. No dedup: min-propagation is insensitive to duplicate
    // edges (groupBy-min absorbs them), so a distinct here would buy
    // nothing for a shuffle. The eager checkpoint runs the pairs plan
    // exactly once and flattens it out of every downstream plan.
    // A null id would propagate as a (null, null) label row and silently
    // drop that edge — same fail-loud stance as the integral-type check,
    // but nulls are data so the check must run per row, not on the schema.
    val edges = pairs
      .select(
        when(col(aCol).isNull || col(bCol).isNull,
          raise_error(lit("duplicateClusters: null id in pair — " +
            "near-dup edges must reference real documents; filter or " +
            "repair null ids before clustering")))
          .otherwise(col(aCol).cast("long")).as("a"),
        col(bCol).cast("long").as("b"))
      .select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint()
    def labelSum(l: DataFrame): java.math.BigDecimal = {
      val r = l.agg(sum(col("rep").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    val dbg = sys.env.contains("GRAFT_CLUSTER_DEBUG")
    var t0 = System.nanoTime()
    var prevSum = labelSum(labels)
    if (dbg) System.err.println(
      f"duplicateClusters init: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    // one min-propagation step: min over self, neighbors' labels, and
    // rep's label (jump).
    // (r21 measured won't-do: a deeper per-round jump — rep³ via a
    // second labels self-join — converged in the SAME 8 rounds on
    // the q205 kNN graph: round count here is edge-diameter-bound
    // (the min label must physically reach distant nodes through
    // edges), so the extra join per round was pure cost. Reverted.)
    def step(l: DataFrame): DataFrame = {
      val viaEdges = edges
        .join(l.select(col("id").as("v"), col("rep")), "v")
        .select(col("u").as("id"), col("rep"))
      val viaReps = l.as("l")
        .join(l.select(col("id").as("r_id"),
          col("rep").as("r_rep")), col("l.rep") === col("r_id"))
        .select(col("l.id").as("id"), col("r_rep").as("rep"))
      viaEdges.union(viaReps).union(l)
        .groupBy("id").agg(min(col("rep")).as("rep"))
    }
    // (r22 measured won't-do, the verdict-#4 idea: TWO propagation
    // steps per materialization — step(step(labels)) — halves the
    // job/sum/checkpoint count, and the hoped-for ReusedExchange on
    // the inner step's aggregation would have made the fused DAG cost
    // ~one round. Measured on q205's kNN graph at sf0.1: each fused
    // round ran ~1.4 s vs ~0.45 s per single round (warm, debug
    // timings) — the inner step's subtree feeds three differently-
    // projected consumers and is recomputed, not reused, so 5 fused
    // rounds cost 7.0 s where 8 single rounds cost 3.6 s. Reverted to
    // the single-step loop; the values were identical both ways.)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      t0 = System.nanoTime()
      val next = step(labels).localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
      if (dbg) System.err.println(
        f"duplicateClusters round $iter: " +
          f"${(System.nanoTime() - t0) / 1e9}%.3f s (converged=$converged)")
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIter rounds — " +
          "pathological near-dup chain; raise maxIter")
    labels.select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
  }

  /** Deterministic pseudo-random hyperplane matrix: `bits` planes × `dim`
    * components, packed row-major. Components are exact binary fractions
    * (k/1024, k ∈ [-1000, 1000], fixed-seed splitmix-style LCG), so a
    * DuckDB oracle embedding the identical decimal literals reproduces
    * every dot product — and therefore every bucket — bit-for-bit
    * (IEEE Double ops in identical element order on both engines). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 0x9E3779B97F4A7C15L)
      : Seq[Double] = {
    var x = seed
    Seq.fill(bits * dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % 2001).toInt - 1000) / 1024.0
    }
  }

  /** The INTEGER form of [[hyperplanes]] (same LCG, components
    * k ∈ [−1000, 1000] instead of k/1024): for uses where the plane
    * arithmetic should stay wholly in the exact-integer regime —
    * Achlioptas-style discrete random projections rank identically to
    * the scaled-double form (projection is scale-invariant) with no
    * float fold to replay. */
  def hyperplanesInt(bits: Int, dim: Int,
      seed: Long = 0x9E3779B97F4A7C15L): Seq[Long] = {
    var x = seed
    Seq.fill(bits * dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % 2001) - 1000
    }
  }

  /** Random-hyperplane sign bucket for embeddings: the concatenated sign
    * bits of the vector's dot products with `planes` (packed row-major,
    * length = bits·dim — see [[hyperplanes]]). Vectors with high cosine
    * similarity agree on most signs, so true near-dups land in the same
    * bucket with high probability — the standard recall/cost LSH
    * trade-off. Signs of dots with FIXED PSEUDO-RANDOM directions (not
    * raw leading dimensions) keep buckets balanced on anisotropic
    * real-world embeddings: positive-mean sentence encoders collapse
    * raw-axis sign buckets into one, turning the within-bucket join
    * near-quadratic. Fused native expression
    * ([[graft.plans.HyperplaneBucketExpr]]); HOF-equivalence + balance
    * covered in VectorExpressionsSpec. */
  def signBucket(vec: Column, planes: Seq[Double]): Column =
    graft.functions.VectorFunctions.hyperplaneBucketNative(vec, planes)

  /** Multi-probe LSH probe set (Lv et al. 2007): the query's own sign
    * bucket plus the buckets reached by flipping its `nFlips`
    * LOWEST-MARGIN bits — the bits whose hyperplane dot product sits
    * closest to zero are the ones a true near-neighbor most likely
    * disagrees on, so probing those buckets buys recall WITHOUT
    * growing the table (the same recall/nprobe trade as IVF probes,
    * on the LSH axis). Margins are the identical left-associated
    * double dot chains the bucket expression evaluates (and the q44
    * oracle replays); the flip ranking quantizes |margin| at 4 dp
    * with bit-index ties, so a SQL replay picks the same bits. */
  def multiProbeBuckets(query: Seq[Float], bits: Int, dim: Int,
      nFlips: Int): Seq[String] = {
    require(query.length == dim,
      s"query dim ${query.length} != expected $dim")
    require(nFlips >= 0 && nFlips <= bits,
      s"nFlips must be in [0, $bits], got $nFlips")
    val planes = hyperplanes(bits, dim)
    val margins = (0 until bits).map { b =>
      var s = 0.0
      var j = 0
      while (j < dim) {
        s += query(j).toDouble * planes(b * dim + j); j += 1
      }
      s
    }
    val base = margins.map(m => if (m >= 0) '1' else '0').mkString
    val flipBits = margins.zipWithIndex
      .map { case (m, b) =>
        (math.floor(math.abs(m) * 1e4 + 0.5).toLong, b) }
      .sorted.take(nFlips).map(_._2)
    base +: flipBits.map { b =>
      base.updated(b, if (base(b) == '1') '0' else '1')
    }
  }

  /** Embedding-cosine near-dup: bucket by hyperplane sign bits, pair
    * within buckets only (bucket-keyed equi-join — no cartesian), score
    * by cosine, keep the global top-k pairs. `dim` must match the
    * embedding dimension (the plane matrix is sized bits·dim). Ranking
    * uses the rounded score + id ties so the result is deterministic
    * cross-engine. */
  def cosinePairs(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bits: Int = 8,
      k: Int = 10,
      roundDp: Int = 4,
      cosine: (Column, Column) => Column = cosineSimilarity(_, _))
      : DataFrame = {
    // the native bucket expression needs the graft registry on whatever
    // session owns `vecs` (driver-side, idempotent)
    VectorExpressions.ensureRegistered(vecs.sparkSession)
    // A wrong `dim` must fail LOUDLY: the plane matrix is packed
    // row-major at bits·dim, so a mismatched vector either reinterprets
    // the matrix as the wrong planes (garbage-but-deterministic buckets,
    // silently degraded recall) or buckets to null (rows silently vanish
    // from the self-join). Same guard shape as IvfIndex.assignToCentroids.
    // NULL vectors are data (a doc without an embedding), not an arg
    // error: they are filtered like every other operator here — raising
    // on them would crash the job on one dirty row while the oracle
    // (whose null bucket never equi-joins) kept going.
    val b = vecs.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        when(size(col(vecCol)) =!= dim,
          raise_error(concat(
            lit(s"NearDup.cosinePairs: vector must have dim $dim, " +
              "got dim "),
            size(col(vecCol)).cast("string"))))
          .otherwise(signBucket(col(vecCol), hyperplanes(bits, dim)))
          .as("bucket"))
    b.as("a")
      .join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        // the cross-engine floor rounding of every other ranked
        // similarity — never engine-native round() (KnnSearch.roundHalfUp
        // scaladoc: the decimal-vs-binary seam)
        KnnSearch.roundHalfUpCol(cosine(col("a.v"), col("b.v")), roundDp)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a_id"), col("b_id"))
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication") over a PRE-CLUSTERED
    * embedding frame (any k-means assignment — in practice the
    * persisted [[IvfIndex]], so one artifact serves ANN search and
    * dedup). A vector is dropped when some lower-id vector in its
    * cluster (and sub-cell, see below) has floor-quantized cosine
    * >= `tau` — min-id as the deterministic stand-in for the paper's
    * centroid-distance representative choice. Returns per-cluster
    * `(cluster_id, n_vecs, n_dropped, n_kept)`.
    *
    * The pair search is an equi-join on the cluster key, so cluster
    * size bounds the quadratic — but K-MEANS DOES NOT BOUND CLUSTER
    * SIZE: one mega-cluster (a boilerplate-heavy corpus collapses
    * embeddings into a dense ball) makes the join quadratic again.
    * `maxCellRows = Some(cap)` is the bounded-work valve: clusters over
    * the cap deterministically sub-split into ceil(n/cap) cells keyed
    * by the md5 of the VECTOR BYTES, and pairs form within cells only.
    * Identical vectors always share a cell (exact duplicates can never
    * escape the cap), near-identical pairs may split across cells —
    * the explicit recall-for-boundedness trade the paper's recluster
    * step makes; measured in NearDupSpec (a 600-row mega-cluster's
    * pair work drops ~6x at cap 100 while every planted exact
    * duplicate still drops). */
  def semDedup(
      clustered: DataFrame,
      idCol: String,
      vecCol: String,
      clusterCol: String,
      tau: Double,
      roundDp: Int = 4,
      maxCellRows: Option[Int] = None,
      cosine: (Column, Column) => Column = cosineSimilarity(_, _))
      : DataFrame = {
    val base = clustered.filter(col(vecCol).isNotNull)
      .select(col(clusterCol).cast("long").as("cluster_id"),
        col(idCol).as("id"), col(vecCol).as("v"))
    val cell = maxCellRows match {
      case None => base.withColumn("cell", lit(0L))
      case Some(cap) =>
        require(cap > 0, s"maxCellRows must be positive, got $cap")
        // cluster sizes are a clusters-count frame — broadcast; the
        // cell key hashes the vector BYTES so identical vectors
        // co-locate by construction
        val sizes = base.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("__n"))
        base.join(broadcast(sizes), Seq("cluster_id"))
          .withColumn("cell",
            pmod(conv(substring(md5(col("v").cast("string")), 1, 8),
                16, 10).cast("long"),
              // ceil(n/cap) cells; Column `/` is true division, so
              // truncate back to long AFTER the add (positives only)
              ((col("__n") + (cap - 1)) / cap).cast("long")))
          .drop("__n")
    }
    val pairs = cell.as("a")
      .join(cell.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(KnnSearch.roundHalfUpCol(
        cosine(col("a.v"), col("b.v")), roundDp) >= lit(tau))
    val nDropped = pairs
      .select(col("a.cluster_id").as("cluster_id"), col("b.id").as("id"))
      .distinct()
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_dropped"))
    cell.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_vecs"))
      .join(nDropped, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vecs") - coalesce(col("n_dropped"), lit(0L)))
          .as("n_kept"))
      .orderBy(col("cluster_id"))
  }
}
