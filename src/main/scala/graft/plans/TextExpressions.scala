package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-n-gram Jaccard against a constant query — the q35 hybrid
  * dense-score hot path (SURVEY §2.8 V3; reference fusion weights
  * /root/reference/src/rag/bge.py:29-32).
  *
  * The composed HOF form (`jaccard(charShingles(text, n),
  * charShingles(lit(q), n))`) materializes a ~`len(text)` element shingle
  * array per row through an interpreted zip_with chain, re-derives the
  * QUERY's shingle set per row, and ejects the projection from
  * whole-stage codegen (HOFs are CodegenFallback). This expression does
  * one fused pass per row: normalize, slide an n-char window, count
  * distinct shingles and query-set hits in a hash set — the query's
  * shingle set is computed once per task from the foldable literal.
  *
  * Semantics match the HOF form exactly (asserted in
  * TextExpressionsSpec): normalize = collapse whitespace runs of
  * `lower(trim(text))` to single spaces; shingles are distinct n-grams
  * over codepoints; jaccard = |A∩B| / (|A|+|B|−|A∩B|), 0.0 when the
  * union is empty, and null/short text behaves as an empty shingle set
  * (the HOF form's `when(inputNull || count <= 0, array())`).
  * CodegenFallback is acceptable here: per-row cost is dominated by the
  * O(len) window walk, not the one virtual call.
  */
case class CharNgramJaccard(
    first: Expression,   // document text (any row expression)
    second: Expression,  // query text (foldable)
    third: Expression)   // shingle width n (foldable, > 0)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {

  override def prettyName: String = "graft_char_jac"
  override def inputTypes = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!second.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: query (2nd arg) must be a constant")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n (3rd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val n: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v > 0, s"$prettyName: n must be positive, got $v")
    v
  }

  private def normalize(s: UTF8String): String =
    s.trim().toLowerCase.toString.replaceAll("\\s+", " ")

  /** distinct n-grams over codepoints (ASCII-transparent; mirrors the
    * codepoint semantics of Spark `split(s, "")` + DuckDB string slices) */
  private def shingleSet(text: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val cps = text.codePoints().toArray
    var i = 0
    while (i + n <= cps.length) {
      out.add(new String(cps, i, n))
      i += 1
    }
    out
  }

  @transient private lazy val querySet: java.util.HashSet[String] = {
    val q = second.eval(null).asInstanceOf[UTF8String]
    if (q == null) new java.util.HashSet[String]()
    else shingleSet(normalize(q))
  }

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    val docNorm =
      if (t == null) "" else normalize(t.asInstanceOf[UTF8String])
    val qs = querySet
    val cps = docNorm.codePoints().toArray
    val seen = new java.util.HashSet[String]()
    var inter = 0
    var i = 0
    while (i + n <= cps.length) {
      val sh = new String(cps, i, n)
      if (seen.add(sh) && qs.contains(sh)) inter += 1
      i += 1
    }
    val uni = seen.size + qs.size - inter
    if (uni <= 0) 0.0 else inter.toDouble / uni
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native SimHash fingerprint — the fused form of
  * [[graft.functions.TextFunctions.simHash]]'s HOF fold, which is an
  * interpreted aggregate of a zip_with of a transform PER TOKEN (the
  * q45 hot path). One pass here: distinct whitespace tokens of
  * `lower(text)`, one md5 per token, signed hex-digit-parity counts per
  * bit position, '1'/'0' string out. Value-identical to the HOF form
  * and the DuckDB oracle (md5-derived, JVM-independent); null text →
  * null, like the HOF chain's null propagation.
  */
case class SimHashExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def prettyName: String = "graft_simhash"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bits (2nd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bits: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 32, s"$prettyName: bits=$v out of md5-hex range")
    v
  }

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  protected override def nullSafeEval(text: Any, bitsArg: Any): Any = {
    val counts = new Array[Int](bits)
    val seen = new java.util.HashSet[String]()
    val md = digest.get()
    // distinct tokens of lower(text), split on whitespace runs
    val toks = text.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+")
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.nonEmpty && seen.add(t)) {
        md.reset()
        val h = md.digest(t.getBytes("UTF-8"))
        var p = 0
        while (p < bits) {
          // hex digit p of the md5: high nibble of byte p/2 when p is
          // even, low nibble when odd; its parity is the nibble's low bit
          val b = h(p >> 1)
          val nibble = if ((p & 1) == 0) (b >> 4) & 0xF else b & 0xF
          counts(p) += ((nibble & 1) << 1) - 1
          p += 1
        }
      }
      ti += 1
    }
    val out = new Array[Byte](bits)
    var p = 0
    while (p < bits) {
      out(p) = if (counts(p) > 0) '1'.toByte else '0'.toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native token statistics — one tokenization pass feeding the
  * text-quality surface (the q03 hot path). The HOF formulation
  * re-tokenizes per metric (stopword ratio, average token length, and
  * the composite score recomputing both — four splits per row, each an
  * interpreted filter/aggregate). This returns
  * `struct<n_tokens, sum_len, n_stop>` from a single pass; the ratios
  * and the composite score are then plain codegen'd arithmetic over the
  * struct fields (see [[graft.functions.TextFunctions.tokenStatsNative]]).
  *
  * Semantics match the HOF forms: tokens are `\s+`-separated non-empty
  * runs, `sum_len` counts codepoints of the original-case tokens,
  * `n_stop` counts (non-distinct) tokens whose lowercase form is in the
  * constant stopword set. Null text → null struct (HOF null
  * propagation).
  */
case class TokenStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def prettyName: String = "graft_tok_stats"
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: stopwords (2nd arg, comma-joined) must be constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val csv = right.eval(null).asInstanceOf[UTF8String]
    if (csv != null)
      csv.toString.split(",").foreach(s => if (s.nonEmpty) out.add(s))
    out
  }

  protected override def nullSafeEval(text: Any, stops: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.split("\\s+")
    var n = 0L
    var sumLen = 0L
    var nStop = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        sumLen += t.codePointCount(0, t.length)
        if (stopSet.contains(t.toLowerCase(java.util.Locale.ROOT))) nStop += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, sumLen, nStop))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native word-n-gram shingling — the fused form of
  * [[graft.functions.TextFunctions.wordShingles]]'s zip_with chain (the
  * q43 near-dup hot path): tokenize `lower(text)` on whitespace, emit
  * the distinct space-joined n-grams in first-occurrence order. Null or
  * too-short text → empty array, exactly like the HOF form's
  * `when(inputNull || count <= 0, array())`.
  */
case class WordShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  override def prettyName: String = "graft_word_shingles"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n (2nd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val n: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v > 0, s"$prettyName: n must be positive, got $v")
    v
  }

  // handles null itself: null text means an EMPTY shingle set, not null
  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val toks = t.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native overlapping word n-gram spans — the Lee et al. 2021
  * substring-dedup unit (q83) in ONE tokenization pass. Unlike
  * [[WordShinglesExpr]] (a dedup SET for MinHash), this preserves
  * MULTIPLICITY and ORDER and the original case: every position i
  * yields tokens[i..i+n) space-joined, so corpus-wide span counts
  * measure duplicated text exactly. The HOF spelling
  * (`transform(sequence(...), i => array_join(slice(ws, i, n)))`)
  * re-evaluates the captured token subtree per sequence element under
  * interpreted eval — O(n²) regex splits per document; this is the
  * one-pass form. Fewer than n words → empty array; null text → null
  * (tokens-of-null is null, unlike the shingle SET where null means
  * "no shingles"). SQL name: `graft_word_spans`.
  */
case class WordSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  override def prettyName: String = "graft_word_spans"
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n (2nd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val n: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v > 0, s"$prettyName: n must be positive, got $v")
    v
  }

  protected override def nullSafeEval(text: Any, nArg: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Gopher quality-filter signals (Rae et al. 2021 §A1.1, q80)
  * in ONE pass over the document: word/char counts, symbol counts
  * (`#` chars plus non-overlapping `...` occurrences — the exact
  * `replace`-then-length arithmetic the oracle replays), line
  * bullet/ellipsis counts, alphabetic-word count, and required-stopword
  * hits, plus the composite cross-multiplied `keep` verdict. The HOF
  * spelling re-splits the text once per signal under interpreted eval
  * (~8 regex splits/row); this does one token split, one lowercase
  * split, one line split. Field-for-field identical to the HOF form —
  * the q80/q82 oracles replay the same integer arithmetic. Second arg:
  * space-joined stopword list (constant). Null text → null. SQL name:
  * `graft_gopher_stats`.
  */
case class GopherStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def prettyName: String = "graft_gopher_stats"
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("word_count", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("symbol_count", LongType, nullable = false),
    StructField("line_count", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false),
    StructField("keep", LongType, nullable = false)))
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: stopwords (2nd arg) must be constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val stopwords: Array[String] = {
    val spec = right.eval(null).asInstanceOf[UTF8String]
    require(spec != null, s"$prettyName: null stopword spec")
    spec.toString.split(" ").filter(_.nonEmpty)
  }

  protected override def nullSafeEval(text: Any, sw: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    // token pass (case preserved): count, char sum, alphabetic words
    var wordCount = 0L
    var charSum = 0L
    var alphaWords = 0L
    val toks = s.split("\\s+")
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (w.nonEmpty) {
        wordCount += 1
        charSum += w.length
        var j = 0
        var alpha = false
        while (!alpha && j < w.length) {
          val c = w.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
            alpha = true
          j += 1
        }
        if (alpha) alphaWords += 1
      }
      i += 1
    }
    // lowercase token pass: distinct required-stopword hits
    var stopwordHits = 0L
    val lowSet = new java.util.HashSet[String]()
    val lowToks = s.toLowerCase.split("\\s+")
    i = 0
    while (i < lowToks.length) {
      if (lowToks(i).nonEmpty) lowSet.add(lowToks(i))
      i += 1
    }
    i = 0
    while (i < stopwords.length) {
      if (lowSet.contains(stopwords(i))) stopwordHits += 1
      i += 1
    }
    // symbol pass: '#' chars + NON-OVERLAPPING "..." occurrences
    // (length(text) − length(replace(text,'...','')))/3 semantics)
    var hashCount = 0L
    i = 0
    while (i < s.length) { if (s.charAt(i) == '#') hashCount += 1; i += 1 }
    var ellipsisCount = 0L
    var from = s.indexOf("...")
    while (from >= 0) {
      ellipsisCount += 1
      from = s.indexOf("...", from + 3)
    }
    val symbolCount = hashCount + ellipsisCount
    // line pass (split keeps empties, like split(text,'\n'))
    val lines = s.split("\n", -1)
    val lineCount = lines.length.toLong
    var bulletLines = 0L
    var ellipsisLines = 0L
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      // first char after leading SPACES (ltrim default = ' ')
      var p = 0
      while (p < l.length && l.charAt(p) == ' ') p += 1
      if (p < l.length && (l.charAt(p) == '-' || l.charAt(p) == '*'))
        bulletLines += 1
      // trailing spaces stripped (rtrim default = ' ')
      var q = l.length
      while (q > 0 && l.charAt(q - 1) == ' ') q -= 1
      if (q >= 3 && l.charAt(q - 1) == '.' && l.charAt(q - 2) == '.' &&
        l.charAt(q - 3) == '.') ellipsisLines += 1
      i += 1
    }
    val keep =
      if (wordCount >= 50L && wordCount <= 100000L &&
        3L * wordCount <= charSum && charSum <= 10L * wordCount &&
        symbolCount * 10L <= wordCount &&
        bulletLines * 10L <= lineCount * 9L &&
        ellipsisLines * 10L <= lineCount * 3L &&
        alphaWords * 10L >= wordCount * 8L &&
        stopwordHits >= 2L) 1L else 0L
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](wordCount, charSum, symbolCount, lineCount,
        bulletLines, ellipsisLines, alphaWords, stopwordHits, keep))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native weighted-query overlap — the sparse + colbert terms of the
  * hybrid fusion (q35) in one tokenization pass. Returns
  * `struct<sparse: double, n_hit: long>` where `sparse` is the sum over
  * ALL tokens of the constant query weight map (the tf × weight dot
  * product) and `n_hit` counts the DISTINCT weighted-query tokens
  * present (the colbert coverage numerator). Value-identical to the
  * composed HOF form (tf map restricted to query keys → sparseDot;
  * array_intersect of distinct tokens); null text → null.
  */
case class QueryOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def prettyName: String = "graft_query_overlap"
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("sparse", DoubleType, nullable = false),
    StructField("n_hit", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: weights (2nd arg, 'k:w,k:w' CSV) must be constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val weights
      : java.util.HashMap[String, java.lang.Double] = {
    val out = new java.util.HashMap[String, java.lang.Double]()
    val csv = right.eval(null).asInstanceOf[UTF8String]
    if (csv != null && csv.numChars() > 0)
      csv.toString.split(",").foreach { kv =>
        val i = kv.lastIndexOf(':')
        require(i > 0, s"$prettyName: malformed weight entry '$kv'")
        out.put(kv.substring(0, i),
          java.lang.Double.valueOf(kv.substring(i + 1)))
      }
    out
  }

  protected override def nullSafeEval(text: Any, w: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+")
    var sparse = 0.0
    val hit = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val wv = weights.get(t)
        if (wv != null) {
          sparse += wv.doubleValue()
          hit.add(t)
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sparse, hit.size().toLong))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native marker-word counts — the language-ID scoring pass (q04) in
  * one tokenization walk. The constant profile spec is
  * `"lang:m1|m2|...,lang2:..."`; the result is `array<long>` of
  * (non-distinct) token hits per profile, in spec order. A token may
  * belong to several profiles and counts for each. Value-identical to
  * the per-profile HOF `size(filter(tokens, contains))` chain; null
  * text → null.
  */
case class MarkerCountsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  override def prettyName: String = "graft_marker_counts"
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: profiles (2nd arg) must be constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** marker → indices of the profiles containing it, plus profile count */
  @transient private lazy val (markerToProfiles, nProfiles)
      : (java.util.HashMap[String, Array[Int]], Int) = {
    val map = new java.util.HashMap[String, Array[Int]]()
    val spec = right.eval(null).asInstanceOf[UTF8String]
    require(spec != null && spec.numChars() > 0,
      s"$prettyName: empty profile spec")
    val profiles = spec.toString.split(",")
    profiles.zipWithIndex.foreach { case (p, i) =>
      val sep = p.indexOf(':')
      require(sep > 0, s"$prettyName: malformed profile '$p'")
      p.substring(sep + 1).split("\\|").foreach { m =>
        if (m.nonEmpty) {
          val prev = map.get(m)
          map.put(m, if (prev == null) Array(i) else prev :+ i)
        }
      }
    }
    (map, profiles.length)
  }

  protected override def nullSafeEval(text: Any, spec: Any): Any = {
    val counts = new Array[Long](nProfiles)
    val toks = text.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val hits = markerToProfiles.get(t)
        if (hits != null) {
          var j = 0
          while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native MinHash signature — element i is the minimum md5 of
  * `"i|" + shingle` over the row's shingle set, i = 0..numHashes-1
  * (one independent permutation per salt; the q43 near-dup signature,
  * identical to the relational explode → per-salt min formulation in
  * [[graft.operators.NearDup.minhashPairs]] and to the DuckDB oracle).
  * One narrow pass per row: no shingle explosion, no aggregation
  * shuffle, the same numHashes md5s per shingle. Minima are tracked on
  * raw digest bytes (unsigned lexicographic == hex-string order) and
  * hex-encoded once at the end. Empty shingle set → null (the
  * relational form never emits a row for it).
  */
case class MinHashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.ArrayType

  override def prettyName: String = "graft_minhash"
  override def inputTypes = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numHashes (2nd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val numHashes: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v > 0, s"$prettyName: numHashes must be positive, got $v")
    v
  }

  @transient private lazy val saltPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  // per-thread 16-byte scratch: the digest loop runs numHashes× per
  // shingle over the whole corpus — digesting into a reused buffer and
  // copying only on a new minimum keeps the loop allocation-free
  @transient private lazy val scratch =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var k = 0
    while (k < a.length) {
      val d = (a(k) & 0xff) - (b(k) & 0xff)
      if (d != 0) return d < 0
      k += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var k = 0
    while (k < bytes.length) {
      out(k * 2) = HexChars((bytes(k) >> 4) & 0xF)
      out(k * 2 + 1) = HexChars(bytes(k) & 0xF)
      k += 1
    }
    new String(out)
  }

  protected override def nullSafeEval(shingles: Any, n: Any): Any = {
    val arr = shingles.asInstanceOf[ArrayData]
    val count = arr.numElements()
    if (count == 0) return null
    val md = digest.get()
    val buf = scratch.get()
    val mins = new Array[Array[Byte]](numHashes)
    var si = 0
    while (si < count) {
      // skip null elements: a null shingle carries no content (callers
      // built via wordShingles never produce one, but the function is
      // registered session-wide)
      if (!arr.isNullAt(si)) {
        val sBytes = arr.getUTF8String(si).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(saltPrefixes(i))
          md.update(sBytes)
          md.digest(buf, 0, 16)
          if (mins(i) == null) {
            mins(i) = java.util.Arrays.copyOf(buf, 16)
          } else if (lessUnsigned(buf, mins(i))) {
            System.arraycopy(buf, 0, mins(i), 0, 16)
          }
          i += 1
        }
      }
      si += 1
    }
    if (mins(0) == null) return null // all elements were null
    new GenericArrayData(
      mins.map(m => UTF8String.fromString(hex(m)): Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native polynomial rolling hash — the fused form of
  * [[graft.functions.TextFunctions.rollingHash]]'s per-character HOF
  * fold (the q47 hot path): h = (h·31 + codepoint) mod 1e9+7 over the
  * whitespace-normalized, lowercased, trimmed text. Codepoint semantics
  * match Spark's `split(s, "") → ascii(c)`; null → null.
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def prettyName: String = "graft_rollhash"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private val Mod = 1000000007L

  protected override def nullSafeEval(text: Any): Any = {
    val norm = text.asInstanceOf[UTF8String].trim().toLowerCase.toString
      .replaceAll("\\s+", " ")
    var h = 0L
    var i = 0
    val n = norm.length
    while (i < n) {
      val cp = norm.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native repetition statistics — the signals behind the Gopher
  * REPETITION filters (Rae et al. 2021 §A1.1: duplicate-line fractions
  * and most-frequent word-2-gram coverage, the boilerplate/spam gate
  * that complements [[graft.functions.TextFunctions.gopherSignals]]'s
  * per-document rules) in ONE hash-map pass per row — O(lines + words),
  * where the per-row HOF formulation is O(n²) recounting (fine in an
  * oracle, wrong in a 100 TB scan).
  *
  * `struct<line_count, dup_line_count, line_chars, dup_line_chars,
  * top_gram, top_gram_count, top_gram_chars, word_chars>`. Semantics
  * (engine defaults, replayed verbatim by the q81 oracle): lines =
  * text split on `\n` with EMPTY lines excluded; a duplicate line is
  * an exact-text line occurring ≥2 times, ALL its occurrences counted
  * in both `dup_line_count` and `dup_line_chars`; words = whitespace
  * tokens (raw case); grams = adjacent word pairs keyed `"w1 w2"`;
  * the top gram is the most frequent with ties to the
  * lexicographically SMALLEST key (binary order — ASCII corpus
  * contract, like the PII patterns); `top_gram_chars` =
  * count · (keyLength − 1) (both words' chars, the joining space
  * excluded). Fewer than 2 words → `top_gram` null, count/chars 0.
  * Null text → null. SQL name: `graft_rep_stats`. */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def prettyName: String = "graft_rep_stats"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("line_count", LongType, nullable = false),
    StructField("dup_line_count", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("top_gram_count", LongType, nullable = false),
    StructField("top_gram_chars", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false)))
  override def nullable: Boolean = true

  protected override def nullSafeEval(text: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    // line stats: one counting pass, one classification pass
    val lines = s.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Int]()
    var lineCount = 0L
    var lineChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.nonEmpty) {
        lineCount += 1
        lineChars += l.length
        lineCounts.merge(l, 1, Integer.sum)
      }
      i += 1
    }
    var dupLineCount = 0L
    var dupLineChars = 0L
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.nonEmpty && lineCounts.get(l) >= 2) {
        dupLineCount += 1
        dupLineChars += l.length
      }
      i += 1
    }
    // word + gram stats
    val rawWords = s.split("\\s+")
    val words = new java.util.ArrayList[String](rawWords.length)
    var wordChars = 0L
    i = 0
    while (i < rawWords.length) {
      val w = rawWords(i)
      if (w.nonEmpty) { words.add(w); wordChars += w.length }
      i += 1
    }
    val gramCounts = new java.util.HashMap[String, Int]()
    i = 0
    while (i < words.size() - 1) {
      gramCounts.merge(words.get(i) + " " + words.get(i + 1), 1,
        Integer.sum)
      i += 1
    }
    var topGram: String = null
    var topCount = 0
    val it = gramCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > topCount ||
        (e.getValue == topCount && topGram != null &&
          e.getKey.compareTo(topGram) < 0)) {
        topGram = e.getKey
        topCount = e.getValue
      }
    }
    val topChars =
      if (topGram == null) 0L else topCount.toLong * (topGram.length - 1)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lineCount, dupLineCount, lineChars, dupLineChars,
        if (topGram == null) null else UTF8String.fromString(topGram),
        topCount.toLong, topChars, wordChars))
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native positional-coverage removal (q106, the substring-dedup
  * rewrite; same family as q100's boilerplate drop): given a token
  * array and the SORTED 0-based start positions of removable
  * fixed-width spans, returns the tokens NOT covered by any
  * `[s, s+width-1]` window — one two-pointer sweep, O(tokens + starts)
  * per row. The HOF spelling (`transform(sequence(...), i ->
  * exists(starts, ...))`) is O(tokens × starts) UNDER INTERPRETED EVAL
  * (lambdas never enter whole-stage codegen) and measured 16 s at
  * sf0.1 where this pass runs in well under a second — the q81 lesson
  * again: one native pass where the lambda form is quadratic.
  * Args: (array<string> tokens, array<int> sorted starts, width
  * constant). Null tokens → null; CodegenFallback is fine (per-row
  * cost is the sweep itself). SQL name: `graft_drop_covered`.
  */
case class DropCoveredExpr(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.ArrayType

  override def prettyName: String = "graft_drop_covered"
  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(IntegerType), IntegerType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: width (3rd arg) must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val width: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v > 0, s"$prettyName: width must be positive, got $v")
    v
  }

  protected override def nullSafeEval(
      toksAny: Any, startsAny: Any, widthAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val starts = startsAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = starts.numElements()
    val out = new java.util.ArrayList[Any](n)
    var p = 0
    var coveredEnd = -1L
    var i = 0
    while (i < n) {
      while (p < m && starts.getInt(p) <= i) {
        val end = starts.getInt(p).toLong + width - 1
        if (end > coveredEnd) coveredEnd = end
        p += 1
      }
      if (i > coveredEnd) out.add(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
