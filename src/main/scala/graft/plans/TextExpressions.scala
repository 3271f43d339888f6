package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
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
