package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Bucket pair-enumeration expressions shared by the LSH families
  * (MinHash bands, SimHash blocks, hyperplane vector buckets): all
  * in-bucket pairs under the skew cap, a linear star around the
  * smallest member over it. One definition so the cap-degrade logic
  * cannot drift between the text and vector paths.
  */
private[graft] object BucketPairs {

  /** Every unordered pair of `membersCol` as struct(x, y), kept when
    * `ltPred` holds (e.g. "p.x < p.y" for scalar members,
    * "p.x.doc_id < p.y.doc_id" for struct members).
    */
  def fullPairs(membersCol: String, ltPred: String): Column =
    expr(
      s"""filter(
         |  flatten(transform($membersCol, a ->
         |    transform($membersCol, b -> struct(a AS x, b AS y)))),
         |  p -> $ltPred)""".stripMargin)

  /** Linear star pairs around the first element of the SORTED array —
    * the over-cap degrade: hot buckets stay represented (and connected,
    * for the transitive grouping) at O(m) instead of O(m²).
    */
  def starPairs(sortedCol: String): Column =
    expr(
      s"""transform(
         |  slice($sortedCol, 2, size($sortedCol) - 1),
         |  m -> struct($sortedCol[0] AS x, m AS y))""".stripMargin)
}
