package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.GraftAbstractDataType
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over string columns (SURVEY.md §2.11
  * family, same construction as [[VectorExpressions.DotProduct]]).
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, and the fuzzy
  * record-linkage entries need one whose scores the DuckDB oracle can
  * reproduce bit-for-bit. A Scala UDF would box two strings per pair on
  * a candidate-pair frame that is the HOT loop of blocked linkage; this
  * expression emits one static call over the raw UTF8String bytes —
  * tight primitive loops, no boxing, whole-stage-codegen friendly.
  *
  * Semantics pinned to the oracle engine (StringSimilaritySpec holds
  * the canonical values probed from it): textbook Jaro with match
  * window `max(len)/2 - 1`, transposition count = half the mismatched
  * matched positions FLOORED to an integer (a 3-cycle contributes 1,
  * not 1.5 — the fuzz harness caught the half-count variant differing
  * on 753/8000 random pairs), Winkler
  * prefix boost `p = 0.1` capped at 4 leading bytes, applied only when
  * the Jaro score exceeds 0.7, and EITHER string empty scores 0.0
  * (including both-empty — unlike the classical 1.0 convention).
  * Distances are over BYTES, not code points, again matching the
  * oracle; the driver tables are ASCII so the two coincide there.
  */
object StringSimilarity {

  /** Jaro-Winkler similarity of two byte strings in [0, 1].
    *
    * Hot-loop discipline: bytes are read in place (`getByte`) instead
    * of copying both sides per call, and byte-equal strings
    * short-circuit to 1.0 — exactly the full algorithm's answer
    * (greedy in-window matching is the identity on equal strings; the
    * oracle engine agrees at 1.0 on 3000 fuzzed self-pairs), and the
    * dominant case when blocked candidates contain exact duplicates.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    if (a.equals(b)) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchA = new Array[Boolean](la)
    val matchB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, lb)
      val ca = a.getByte(i)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!matchB(j) && ca == b.getByte(j)) {
          matchA(i) = true
          matchB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Mismatched positions between the two matched-char sequences.
    var k = 0
    var mism = 0
    i = 0
    while (i < la) {
      if (matchA(i)) {
        while (!matchB(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = (mism / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(math.min(la, lb), 4)
    while (prefix < maxPrefix && a.getByte(prefix) == b.getByte(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[GraftAbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.StringSimilarity.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Column form; inputs coerced to string. */
  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(
      expression(a.cast(StringType)), expression(b.cast(StringType))))

  /** Register `jaro_winkler` as a SQL function in a session. */
  def register(spark: SparkSession): Unit = {
    def s(e: Expression): Expression =
      if (e.dataType == StringType) e else Cast(e, StringType)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => {
        require(exprs.length == 2,
          s"jaro_winkler requires exactly 2 arguments, got ${exprs.length}")
        JaroWinkler(s(exprs(0)), s(exprs(1)))
      }, "scala_udf")
  }
}
