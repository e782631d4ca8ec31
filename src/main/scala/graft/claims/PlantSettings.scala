package graft.claims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-plant saved dashboard configuration + the canonical filter
  * macros (ref: data/plant_settings.json; constants
  * pages/3_플랜트_분석.py:28-31; SURVEY.md Appendix).
  */
object PlantSettings {

  /** Performance-view filter macro: 사업부문 ∈ {식품, B2B식품} and
    * 불만원인 ∈ {제조불만, 고객불만족, 구매불만}
    * (ref: pages/3_플랜트_분석.py:30-31).
    */
  val performanceBusinessUnits: Seq[String] = Seq("식품", "B2B식품")
  val performanceComplaintCauses: Seq[String] =
    Seq("제조불만", "고객불만족", "구매불만")

  def performanceFilter(df: DataFrame): DataFrame =
    df.filter(col("사업부문").isin(performanceBusinessUnits: _*) &&
      col("불만원인").isin(performanceComplaintCauses: _*))

  /** P9 — cascade filter options: the distinct values of `target` AFTER
    * applying the already-chosen upstream filters, sorted
    * (ref: pages/3:144-160; chain 사업부문→불만원인→등급기준→대분류).
    */
  def cascadeOptions(df: DataFrame, chosen: Seq[(String, Seq[String])],
      target: String): Seq[String] = {
    val filtered = chosen.foldLeft(df) { case (acc, (c, vs)) =>
      if (vs.isEmpty) acc else acc.filter(col(c).isin(vs: _*))
    }
    filtered.select(col(target)).filter(col(target).isNotNull)
      .distinct().orderBy(col(target))
      .collect().map(_.getString(0)).toSeq
  }

  final case class PlantConfig(
      filterBusiness: Seq[String],
      filterReason: Seq[String],
      filterGrade: Seq[String],
      filterMajorCategory: Seq[String],
      savedPivotRows: Seq[String])

  /** Load the per-plant saved filters (driver-side config, like the
    * reference — not a distributed concern).
    */
  def load(spark: SparkSession, path: String): Map[String, PlantConfig] = {
    import scala.jdk.CollectionConverters._
    val rows = spark.read.option("multiLine", "true").json(path)
    val plants = rows.columns.toSeq
    val row = rows.collect()(0)
    plants.map { p =>
      val s = row.getAs[org.apache.spark.sql.Row](p)
      def seqOf(field: String): Seq[String] =
        if (s.schema.fieldNames.contains(field) && !s.isNullAt(s.fieldIndex(field)))
          s.getAs[scala.collection.Seq[String]](field).toSeq
        else Seq.empty
      p -> PlantConfig(
        seqOf("filter_business"), seqOf("filter_reason"),
        seqOf("filter_grade"), seqOf("filter_major_category"),
        seqOf("saved_pivot_rows"))
    }.toMap
  }
}
