package graft.claims

import org.apache.spark.sql.types._

/** Canonical claims schema — the 54 target columns of the reference
  * (ref: core/config.py:12-90) plus the preprocess-derived columns
  * (ref: core/etl.py:181-280).
  *
  * Ingest is untyped (everything lands as string, like pandas `object`);
  * `ClaimsEtl.preprocess` coerces the typed columns. 1 row = 1 claim.
  */
object ClaimsSchema {

  /** ref: core/config.py:12-90 — exactly 54, order preserved. */
  val target54: Seq[String] = Seq(
    // 접수 정보
    "접수년", "접수월", "접수일", "접수경로",
    // 사업 정보
    "사업부문", "상담번호",
    // 제품 정보
    "제품명", "제품코드", "제품군", "제품범주1", "제품범주2", "제품범주3",
    "제품구분1", "제품구분2",
    // 클레임 내용
    "제목", "요구사항", "분석결과", "등급기준", "불만원인",
    // 분류 정보
    "대분류", "중분류", "소분류",
    // 날짜 정보 - 유통기한
    "유통기한", "유통기한-년", "유통기한-월", "유통기한-일",
    // 날짜 정보 - 제조
    "제조일자", "제조-년", "제조-월", "제조-일",
    // 구입 정보
    "구입일자", "구입경로", "구입처", "플랜트",
    // 처리 정보
    "개선부서명", "조치방법", "방문일자",
    // 고객 정보
    "주소1", "성별", "연령",
    // 금액 정보
    "총처리액", "보상액", "택배비용", "보상액(자소)", "기타비용",
    // 기타 정보
    "LOT", "이물신고대상", "신고일자", "행정처분", "발생일자", "인체피해",
    "중대보고공유", "신속공유", "이물신고체크")

  require(target54.length == 54, s"field count: ${target54.length} (54 required)")

  /** Partition columns of the hub (ref: core/config.py:100). */
  val partitionCols: Seq[String] = Seq("접수년", "접수월")

  /** Claim key (ref: core/etl.py:206 — trimmed string). */
  val keyCol: String = "상담번호"

  /** Columns derived by preprocess (ref: core/etl.py:223-265). */
  val receiptDateCol = "접수일자"
  val lagDaysCol = "Lag_Days"
  val lagValidCol = "Lag_Valid"

  /** Ingest-order column added at load: pandas `keep='last'` dedup
    * depends on physical row order, which Spark does not have — the
    * rebuild makes the ordering explicit (SURVEY.md §7.5 item 1).
    */
  val ingestSeqCol = "_ingest_seq"

  /** Money columns coerced to double (ref: FIXTURES.md §2). */
  val moneyCols: Seq[String] =
    Seq("총처리액", "보상액", "택배비용", "보상액(자소)", "기타비용")

  /** Multi-format-parsed date columns (ref: core/etl.py:237-256). */
  val parsedDateCols: Seq[String] = Seq("제조일자", "유통기한")

  /** Critical grades for risk scoring (ref: core/analytics.py:56). */
  val criticalGrades: Set[String] = Set("중대", "위험", "사고")

  /** The untyped (all-string) canonical schema at ingest. */
  val rawSchema: StructType =
    StructType(target54.map(c => StructField(c, StringType, nullable = true)))
}
