package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, Bin, Cast, Coalesce, Conv, Divide, EqualTo, Expression, Floor, If, IsNull, Length, Literal, Md5, Multiply, NamedExpression, Remainder, ShiftLeft, Subtract, Substring}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, IntegerType, LongType, StringType}

/** OPT-IN optimizer rule: rewrite `count(DISTINCT x)` aggregates into
  * the HyperLogLog register pipeline of
  * [[graft.operators.Sketches.hllRegisters]]/`hllEstimate` — SURVEY
  * §4's "extend the engine, don't wrap it" discipline applied to the
  * single most expensive aggregation shape at 100 TB. An exact
  * distinct count shuffles every distinct (group, x) pair; the
  * rewritten plan shuffles at most `groups·m` register rows with
  * map-side combine, at the sketch's documented ~1.04/√m error.
  *
  * APPROXIMATION IS OPT-IN, exactly like [[IvfAutoProbe]]: the rule
  * fires only when `spark.graft.approxDistinct.m` names a supported
  * register count (16 | 32 | 64 | 128 | 256; 0 / unset = off).
  * Matched shape — a non-streaming Aggregate whose grouping
  * expressions are plain attributes and whose output carries EXACTLY
  * ONE aggregate function: an unfiltered, single-argument, distinct
  * Count. Anything else (multiple aggregates, FILTER clauses,
  * multi-arg counts, computed grouping keys, streaming plans) passes
  * through untouched — the rule narrows rather than guesses.
  *
  * The rewrite replays the q101 arithmetic in raw Catalyst
  * expressions (md5 register index, max-ρ registers, the
  * power-of-two-reciprocal harmonic sum whose partial sums are all
  * exactly representable), so the result is deterministic and
  * engine-exact — the q127 oracle rebuilds the identical value in
  * DuckDB. The distinct count's LongType schema is preserved by
  * rounding the estimate half-up to a long under the ORIGINAL ExprId,
  * so parent operators resolve unchanged; all-null and empty groups
  * emit 0, matching exact count(DISTINCT).
  *
  * Small-range caveat (spec-pinned): groups whose true cardinality is
  * far below m read the RAW estimator's ~α·m bias — the
  * no-linear-counting regime [[graft.operators.Sketches.hllEstimate]]
  * documents (linear counting needs libm `ln`, the one op whose last
  * bit IEEE does not pin across engines). The flag is for
  * corpus-scale distinct counts; size m to the expected n. */
case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import ApproxDistinctRewrite._

  private def m: Int =
    Try(spark.conf.get(MConf, "0").toInt).getOrElse(0)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mm = m
    if (!SupportedM.contains(mm) || plan.isStreaming) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg, mm).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, m: Int): Option[LogicalPlan] = {
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute]))
      return None
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggFns match {
      case Seq(ae @ AggregateExpression(
          Count(Seq(x)), Complete, true, None, _)) =>
        // the count must sit DIRECTLY under its output alias — a
        // count(distinct) nested in arithmetic is left alone
        agg.aggregateExpressions.collectFirst {
          case a @ Alias(`ae`, _) => a
        }.map { countAlias =>
          build(agg, countAlias, x, m)
        }
      case _ => None
    }
  }

  /** Project(groups, r, ρ) → Aggregate(groups+r, max ρ) →
    * Aggregate(groups, estimate) with the original output schema. */
  private def build(agg: Aggregate, countAlias: Alias, x: Expression,
      m: Int): LogicalPlan = {
    val gAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
    val md5 = Md5(Cast(Cast(x, StringType), BinaryType))
    def hex(pos: Int, len: Int): Expression =
      Cast(Conv(Substring(md5, Literal(pos), Literal(len)),
        Literal(16), Literal(10)), LongType)
    // null x → null r/ρ: the register Max ignores them, mirroring
    // count(DISTINCT)'s null-dropping WITHOUT filtering rows (a
    // Filter would erase all-null groups, which must survive as 0)
    val rA = Alias(Remainder(hex(1, 2), Literal(m.toLong)), "__hll_r")()
    val wExpr = hex(3, 8)
    val rhoA = Alias(If(EqualTo(wExpr, Literal(0L)), Literal(33L),
      Subtract(Literal(33L), Cast(Length(Bin(wExpr)), LongType))),
      "__hll_rho")()
    val proj = Project((gAttrs :+ rA :+ rhoA).toSeq, agg.child)
    val mregA = Alias(AggregateExpression(Max(rhoA.toAttribute),
      Complete, isDistinct = false), "__hll_mreg")()
    val regs = Aggregate((gAttrs :+ rA.toAttribute).toSeq,
      (gAttrs :+ rA.toAttribute :+ mregA).toSeq, proj)
    val mreg = mregA.toAttribute
    val present: Expression =
      AggregateExpression(Count(Seq(mreg)), Complete, isDistinct = false)
    val hsum: Expression = Coalesce(Seq(
      AggregateExpression(Sum(
        If(IsNull(mreg), Literal(null, DoubleType),
          Divide(Literal(1.0), Cast(ShiftLeft(Literal(1L),
            Cast(mreg, IntegerType)), DoubleType)))),
        Complete, isDistinct = false),
      Literal(0.0)))
    val est = Divide(
      Multiply(Literal(AlphaFor(m)),
        Literal((m.toLong * m.toLong).toDouble)),
      Add(Cast(Subtract(Literal(m.toLong), present), DoubleType), hsum))
    val outCount = Alias(
      If(EqualTo(present, Literal(0L)), Literal(0L),
        Cast(Floor(Add(est, Literal(0.5))), LongType)),
      countAlias.name)(exprId = countAlias.exprId)
    val outExprs = agg.aggregateExpressions.map {
      case a if a eq countAlias => outCount: NamedExpression
      case other => other
    }
    Aggregate(gAttrs.toSeq, outExprs, regs)
  }
}

object ApproxDistinctRewrite {
  val MConf = "spark.graft.approxDistinct.m"
  val SupportedM: Set[Int] = Set(16, 32, 64, 128, 256)

  /** standard HLL bias constants per register count */
  def AlphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case n => 0.7213 / (1.0 + 1.079 / n)
  }
}
