package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the exact-integer topic clustering
  * (q_text_topics): on a corpus with two DISJOINT vocabularies the
  * topics must stay pure — an anchor doc is single-vocabulary, a
  * cross-vocabulary doc has zero dot product with the other side's
  * centroid, so no Lloyd step can mix the term sets — and every doc
  * with a pruned-vocab term must be counted in exactly one topic.
  * The driver oracle covers the bulk arithmetic; this pins the
  * clustering SEMANTICS where the synthetic corpus can't.
  */
class TopicSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("disjoint vocabularies yield pure topics covering every doc") {
    import spark.implicits._
    val fruit = "apple banana cherry"
    val animal = "dog elephant fox"
    val docs = (1L to 4L).map(i => (i, (fruit + " ") * i.toInt)) ++
      (5L to 8L).map(i => (i, (animal + " ") * (i.toInt - 4)))
    val dir = java.nio.file.Files.createTempDirectory("graft-topics")
    try {
      docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.SparkEntry.queries("q_text_topics")(
        spark, dir.toString).collect()
      val fruitTerms = Set("apple", "banana", "cherry")
      val animalTerms = Set("dog", "elephant", "fox")
      // Every reported term is real vocabulary, and no topic mixes.
      val byTopic = out.groupBy(_.getLong(0)).values
      byTopic.foreach { rows =>
        val terms = rows.map(_.getString(2)).toSet
        assert(terms.subsetOf(fruitTerms) || terms.subsetOf(animalTerms),
          s"mixed topic: $terms")
      }
      // Topic sizes partition the 8 docs.
      val sizes = out.groupBy(_.getLong(0))
        .map { case (_, rows) => rows.head.getLong(4) }
      assert(sizes.sum == 8L, s"doc counts ${sizes.toSeq} do not sum to 8")
      // Both vocabularies surface somewhere.
      val allTerms = out.map(_.getString(2)).toSet
      assert(fruitTerms.subsetOf(allTerms) && animalTerms.subsetOf(allTerms))
      // Weights are positive scaled integers; ranks are 1-based and
      // bounded by the top-5 cut.
      assert(out.forall(r => r.getLong(3) > 0))
      assert(out.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 5))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }
}
