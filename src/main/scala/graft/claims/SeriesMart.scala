package graft.claims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nested time-series datamart: one document per (플랜트, 제품범주2,
  * 대분류) with a zero-filled monthly history, per-중분류 children, and
  * series stats (ref: core/storage.py:470-660 `generate_nested_series`).
  *
  * Semantics replicated exactly:
  *  - month spine = global min→max month of 접수일자 over the WHOLE hub
  *  - `history` counts ALL rows; `stats` (mean/std/slope) are computed
  *    from Lag_Valid-only counts — the reference's deliberate asymmetry
  *    (core/storage.py:558-573)
  *  - std is sample stddev ddof=1 (np.nanstd(arr, ddof=1)); slope =
  *    least-squares slope of the last 3 points = (y₃−y₁)/2; avg_lag_days
  *    = mean of valid lags rounded to 1dp, 0.0 when none
  *  - JSON `key` joins raw values with Python str() semantics (null →
  *    "None"); filenames sanitize `[\/:*?"<>|]` → "-" with null → ""
  *
  * Scale shape: two aggregations (child-grain counts, then struct
  * assembly) — the hub scan reduces to (#keys × #months) rows before
  * any document is built; documents are bounded by months × children.
  * The mart itself is written as a partitioned JSON dataset (file-per-
  * key is a driver-side export kept for reference-layout compatibility;
  * at 100 TB key cardinality the dataset form is the real sink).
  */
object SeriesMart {

  private val parentKeys = Seq("플랜트", "제품범주2", "대분류")
  private val childKey = "중분류"

  /** Sample stddev (ddof=1) of an array column, 0.0 when n ≤ 1. */
  private def stdSample(arr: Column): Column = {
    val n = size(arr).cast("double")
    val mean = aggregate(arr, lit(0.0), (a, x) => a + x) / n
    val ss = aggregate(arr, lit(0.0), (a, x) => a + x * x)
    when(n > 1, sqrt(greatest((ss - n * mean * mean) / (n - 1), lit(0.0))))
      .otherwise(lit(0.0))
  }

  private def meanOf(arr: Column): Column = {
    val n = size(arr).cast("double")
    when(n > 0, aggregate(arr, lit(0.0), (a, x) => a + x) / n).otherwise(lit(0.0))
  }

  /** Least-squares slope of the last 3 points ((y₃−y₁)/2 for n=3
    * equispaced), 0.0 when fewer than 3 (ref: core/storage.py:486-500).
    */
  private def slope3(arr: Column): Column =
    when(size(arr) >= 3,
      (element_at(arr, -1) - element_at(arr, -3)) / 2.0)
      .otherwise(lit(0.0))

  private def statsStruct(validArr: Column, avgLag: Column): Column =
    struct(
      meanOf(validArr).as("mean"),
      stdSample(validArr).as("std"),
      slope3(validArr).as("slope"),
      round(coalesce(avgLag, lit(0.0)), 1).as("avg_lag_days"))

  /** Python-str key component: null → "None" (ref: str(plant)). */
  private def pyStr(c: String): Column =
    coalesce(col(c).cast("string"), lit("None"))

  /** Filename-sanitized component: null → "", forbidden chars → "-"
    * (ref: core/storage.py:465-469).
    */
  private def sanitized(c: String): Column =
    regexp_replace(coalesce(col(c).cast("string"), lit("")),
      "[\\\\/:*?\"<>|]", "-")

  /** Build the mart as a DataFrame of nested documents. `asOf` stands in
    * for the reference's wall-clock `last_updated`.
    */
  /** USING-style join with NULL-SAFE key equality: the grouped sides
    * keep null-key groups, and ClaimsEtl canonicalization produces
    * null keys for ANY column missing from an upload — a plain
    * equi-join silently dropped those keys' entire histories (the
    * joinBackByKey / twoLevelRank null-key convention, applied here
    * in round 9).
    */
  private def joinNullSafe(left: DataFrame, right: DataFrame,
      cols: Seq[String], how: String): DataFrame = {
    val renamed = cols.foldLeft(right)(
      (acc, c) => acc.withColumnRenamed(c, s"__r_$c"))
    val cond = cols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce[org.apache.spark.sql.Column](_ && _)
    left.join(renamed, cond, how).drop(cols.map(c => s"__r_$c"): _*)
  }

  def build(claims: DataFrame, asOf: String,
      spine: Option[(String, String)] = None): DataFrame = {
    val base = claims.withColumn("ym",
      date_format(col(ClaimsSchema.receiptDateCol), "yyyy-MM"))

    // global month spine (dated rows only). `spine` overrides the
    // bounds — the incremental refresh rebuilds a SUBSET of keys but
    // their histories must span the same global months as every other
    // document ([[refreshIncremental]]).
    val bounds = spine match {
      case Some((lo, hi)) =>
        val s = claims.sparkSession
        import s.implicits._
        Seq((lo, hi)).toDF("lo", "hi")
      case None => base.filter(col("ym").isNotNull)
        .agg(min("ym").as("lo"), max("ym").as("hi"))
    }

    // child-grain monthly counts (all rows + Lag_Valid-only)
    val childCols = parentKeys :+ childKey
    val counts = base.filter(col("ym").isNotNull)
      .groupBy((childCols :+ "ym").map(col): _*)
      .agg(count(lit(1)).as("n_all"),
        sum(when(col(ClaimsSchema.lagValidCol), 1L).otherwise(0L)).as("n_valid"))

    // every (child key × month) — keys from ALL rows (a key whose rows
    // are all undated still yields an all-zero history, as in the ref)
    val keys = claims.select(childCols.map(col): _*).distinct()

    // per-child / per-parent lag stats
    val childLags = claims.groupBy(childCols.map(col): _*)
      .agg(avg(when(col(ClaimsSchema.lagValidCol),
        col(ClaimsSchema.lagDaysCol))).as("avg_lag"))
    val parentLags = claims.groupBy(parentKeys.map(col): _*)
      .agg(avg(when(col(ClaimsSchema.lagValidCol),
        col(ClaimsSchema.lagDaysCol))).as("avg_lag"))

    assemble(fillMonths(bounds, keys, counts), childLags, parentLags, asOf)
  }

  /** Document assembly from the maintained count store instead of hub
    * rows ([[SeriesCounts]]) — the O(delta) refresh path. Produces
    * BIT-IDENTICAL documents to [[build]] over the hub the counts were
    * derived from (spec-pinned): `n_all`/`n_valid` are exact integer
    * sums either way, and `sum_lag / n_valid` reproduces Spark's
    * avg(when(valid, lag)) exactly because Lag_Days is an int (both
    * sides sum exactly-representable doubles, then divide once).
    */
  def buildFromCounts(countRows: DataFrame, asOf: String,
      spine: Option[(String, String)] = None): DataFrame = {
    // Collapse the store's partition grain (접수년/접수월 carried from
    // the hub layout) to pure (child key, ym) — normally 1:1 already,
    // but a hub row whose partition values disagree with its receipt
    // date must still count once and only once.
    val childCols = parentKeys :+ childKey
    val base = countRows
      .groupBy((childCols :+ "ym").map(col): _*)
      .agg(sum("n_all").as("n_all"), sum("n_valid").as("n_valid"),
        sum("sum_lag").as("sum_lag"))

    val bounds = spine match {
      case Some((lo, hi)) =>
        val s = countRows.sparkSession
        import s.implicits._
        Seq((lo, hi)).toDF("lo", "hi")
      case None => base.filter(col("ym").isNotNull)
        .agg(min("ym").as("lo"), max("ym").as("hi"))
    }
    val counts = base.filter(col("ym").isNotNull)
      .select((childCols :+ "ym" :+ "n_all" :+ "n_valid").map(col): _*)
    // keys from ALL count rows — the ym-null grain keeps all-undated
    // keys alive, mirroring build()'s keys-from-all-rows.
    val keys = base.select(childCols.map(col): _*).distinct()

    def lags(group: Seq[String]): DataFrame = base
      .groupBy(group.map(col): _*)
      .agg(sum("sum_lag").as("__sl"), sum("n_valid").as("__nv"))
      .select(group.map(col) :+
        when(col("__nv") > 0, col("__sl") / col("__nv"))
          .as("avg_lag"): _*)

    assemble(fillMonths(bounds, keys, counts), lags(childCols),
      lags(parentKeys), asOf)
  }

  /** Zero-filled (child key × month) grid from explicit spine bounds. */
  private def fillMonths(bounds: DataFrame, keys: DataFrame,
      counts: DataFrame): DataFrame = {
    val childCols = parentKeys :+ childKey
    val months = bounds.select(explode(sequence(
      to_date(col("lo"), "yyyy-MM"), to_date(col("hi"), "yyyy-MM"),
      expr("interval 1 month"))).as("md"))
      .select(date_format(col("md"), "yyyy-MM").as("ym"))
    joinNullSafe(broadcast(months).crossJoin(keys),
      counts, childCols :+ "ym", "left")
      .na.fill(0L, Seq("n_all", "n_valid"))
  }

  /** The shared document-assembly tail: child series + stats, parent
    * series + stats, nested struct shape. `filled` is the zero-filled
    * (child key, ym, n_all, n_valid) grid; `childLags`/`parentLags`
    * carry `avg_lag` (nullable) at their grains.
    */
  private def assemble(filled: DataFrame, childLags: DataFrame,
      parentLags: DataFrame, asOf: String): DataFrame = {
    val childCols = parentKeys :+ childKey
    val childSeries = filled
      .groupBy(childCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("ym"), col("n_all"), col("n_valid"))))
        .as("series"))
      .transform(joinNullSafe(_, childLags, childCols, "left"))
      .select(
        parentKeys.map(col) :+
          struct(
            coalesce(col(childKey).cast("string"), lit("")).as("sub_key"),
            statsStruct(transform(col("series"), s => s.getField("n_valid").cast("double")),
              col("avg_lag")).as("stats"),
            transform(col("series"), s =>
              struct(s.getField("ym").as("date"),
                s.getField("n_all").cast("int").as("count"))).as("history"))
            .as("child"): _*)

    val children = childSeries
      .groupBy(parentKeys.map(col): _*)
      .agg(array_sort(collect_list(col("child"))).as("children"))

    // parent-grain series (sums over the zero-filled child grid)
    val pCounts = filled
      .groupBy((parentKeys :+ "ym").map(col): _*)
      .agg(sum("n_all").as("n_all"), sum("n_valid").as("n_valid"))

    val parents = pCounts
      .groupBy(parentKeys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("ym"), col("n_all"), col("n_valid"))))
        .as("series"))
      .transform(joinNullSafe(_, parentLags, parentKeys, "left"))

    joinNullSafe(parents, children, parentKeys, "left")
      .select(
        concat_ws("_", parentKeys.map(pyStr): _*).as("key"),
        concat_ws("_", parentKeys.map(sanitized): _*).as("filename_key"),
        struct(
          lit(asOf).as("last_updated"),
          lit(0).as("warning_level"),
          lit(null).cast("string").as("champion_model"),
          statsStruct(transform(col("series"), s => s.getField("n_valid").cast("double")),
            col("avg_lag")).as("parent_stats")).as("meta"),
        struct(
          transform(col("series"), s =>
            struct(s.getField("ym").as("date"),
              s.getField("n_all").cast("int").as("count"))).as("history"),
          array().cast("array<struct<date:string,count:int>>").as("forecast"))
          .as("data"),
        coalesce(col("children"),
          array().cast(
            "array<struct<sub_key:string,stats:struct<mean:double,std:double,slope:double,avg_lag_days:double>,history:array<struct<date:string,count:int>>>>"))
          .as("children"))
  }

  /** Dataset-form sink (the 100 TB path): one JSON dataset, partition
    * count sized by the writer.
    */
  def writeJsonDataset(mart: DataFrame, dir: String): Unit =
    mart.drop("filename_key").write.mode("overwrite").json(dir)

  private val bucketCol = "key_bucket"

  /** Key-bucketed parquet form of the mart — the layout that makes
    * INCREMENTAL maintenance possible: documents hash into a bounded
    * number of partitions, so a refresh touching few keys rewrites few
    * directories. Parquet (not JSON) so the read-back schema is exact
    * and the refresh's keep∪rebuilt union never drifts on inference.
    *
    * STATIC overwrite by default: a standalone write (and the full-
    * rebuild path) replaces the WHOLE mart, including buckets whose
    * documents all disappeared — dynamic overwrite would leave those
    * buckets' old files as ghost documents no fresh build produces.
    * Only [[refreshIncremental]]'s touched-bucket write passes
    * `dynamic = true`, where untouched buckets keeping their bytes is
    * the point.
    */
  def writeBucketedMart(mart: DataFrame, dir: String,
      buckets: Int = 64, dynamic: Boolean = false,
      spine: Option[(String, String)] = None): Unit = {
    mart.withColumn(bucketCol, pmod(xxhash64(col("key")), lit(buckets)))
      .write
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .partitionBy(bucketCol)
      .mode("overwrite")
      .parquet(dir)
    // A static (full) write stamps the meta AFTER the data commits —
    // with `spine` when the caller knows it (the guarded full
    // rebuild), buckets-only otherwise (a direct call) so point
    // lookups ([[readDocument]]) can still prune while
    // [[refreshIncremental]] treats the spine-less layout as
    // unverifiable and full-rebuilds. The incremental (dynamic) path
    // leaves the meta alone — its caller validated it already.
    if (!dynamic) {
      val spark = mart.sparkSession
      val root = new org.apache.hadoop.fs.Path(dir)
      writeMartMeta(
        root.getFileSystem(spark.sparkContext.hadoopConfiguration),
        dir, buckets, spine)
    }
  }

  /** O(one bucket) point lookup of a mart document by its key — the
    * reference UI's per-series read (it opens one JSON file per key;
    * here the xxhash bucket is the file-system unit). The layout's
    * bucket count comes from the [[martMetaFile]] marker, never from a
    * caller's guess; a marker-less layout (foreign/hand-written)
    * degrades to a key-filtered full scan rather than a wrong-bucket
    * miss.
    */
  def readDocument(spark: org.apache.spark.sql.SparkSession,
      dir: String, key: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Heal the vacated-bucket delete journal FIRST (r10 review): after
    // a crash between a refresh's dynamic-overwrite commit and its
    // vacated-bucket deletes, a drained key's stale files are still on
    // disk — without the heal a point lookup serves that ghost
    // document until the next refresh happens to run. Healing here is
    // one existence check in the common (no-crash) case.
    DeleteJournal.heal(fs, new org.apache.hadoop.fs.Path(dir),
      martPendingDeletesFile)
    val base = spark.read.parquet(dir)
    readMartMeta(fs, dir) match {
      case Some((n, _)) =>
        // The key's bucket is the same xxhash64 expression the writer
        // uses, INLINED over literals — constant folding turns it into
        // the bucket value at optimization time, so partition pruning
        // fires without a separate driver job to pre-hash the key.
        base.filter(col(bucketCol) === pmod(xxhash64(lit(key)), lit(n)) &&
            col("key") === key)
          .drop(bucketCol)
      case None =>
        base.filter(col("key") === key).drop(bucketCol)
    }
  }

  /** Mart metadata marker (leading `_` keeps it invisible to the
    * parquet reader, like `_SUCCESS`): the bucket count the layout was
    * written with and the month spine its histories span. Read by
    * [[refreshIncremental]] to validate that an incremental write is
    * meaningful — a bucket-count change or spine drift silently
    * corrupts a dynamic-overwrite union, so either forces the full
    * rebuild. Written temp-then-rename so a crash never leaves a torn
    * marker.
    */
  private[claims] val martMetaFile = "_graft_mart_meta"

  private def writeMartMeta(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, buckets: Int, spine: Option[(String, String)]): Unit =
    DeleteJournal.writeMarkerAtomic(fs,
      new org.apache.hadoop.fs.Path(dir), martMetaFile,
      s"buckets=$buckets\n" + spine.fold("")(s =>
        s"lo=${s._1}\nhi=${s._2}\n"))

  private def readMartMeta(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[(Int, Option[(String, String)])] = {
    val marker = new org.apache.hadoop.fs.Path(dir, martMetaFile)
    if (!fs.exists(marker)) return None
    val in = fs.open(marker)
    val kv =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
      finally in.close()
    kv.get("buckets").flatMap(b => scala.util.Try(b.toInt).toOption)
      .map(b => (b, for (lo <- kv.get("lo"); hi <- kv.get("hi")) yield (lo, hi)))
  }

  /** Mart keys the batch's claims are CURRENTLY filed under in a hub —
    * run against the PRE-upsert hub to capture the parent keys a claim
    * is about to move away from. An upload that corrects a claim's
    * 플랜트/제품범주2/대분류 changes its mart document; the batch alone
    * only names the NEW document, and without the old one in the
    * touched set [[refreshIncremental]] would leave it permanently
    * stale. Null-key batch rows never match (they cannot be updates of
    * an existing claim — the hub merge collapses them separately).
    */
  def priorParentKeys(preUpsertHub: DataFrame, batch: DataFrame): Set[String] = {
    val keys = batch.filter(col(ClaimsSchema.keyCol).isNotNull)
      .select(col(ClaimsSchema.keyCol)).distinct()
    // Same broadcast-semi-join probe the upsert runs (HubStore.
    // oldLocations, Catalyst-pruned to key + parent columns). An
    // upload pays it twice — once here against the pre-upsert hub,
    // once inside the upsert — a deliberate trade: both scans are
    // narrow (probe columns only), and fusing them would mean the
    // upsert API accepting a precomputed probe it cannot trust.
    HubStore.oldLocations(preUpsertHub, keys)
      .select(concat_ws("_", parentKeys.map(pyStr): _*).as("key"))
      .distinct().collect().map(_.getString(0)).toSet
  }

  /** Path-aware [[priorParentKeys]]: on a bucketed hub layout the
    * probe prunes to the batch keys' bucket partitions (the same
    * [[HubStore.oldLocationsBucketed]] pruning the upsert's own probe
    * gets), turning the flow's last full-hub narrow scan into a
    * touched-buckets read. Falls back to the flat probe when the
    * layout carries no bucket marker.
    */
  def priorParentKeys(spark: org.apache.spark.sql.SparkSession,
      hubPath: String, batch: DataFrame): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(hubPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hub = HubStore.read(spark, hubPath)
    HubStore.readHubMeta(fs, root) match {
      case Some(b) =>
        val keys = batch.filter(col(ClaimsSchema.keyCol).isNotNull)
          .select(col(ClaimsSchema.keyCol)).distinct()
        HubStore.oldLocationsBucketed(hub, keys, b)
          .select(concat_ws("_", parentKeys.map(pyStr): _*).as("key"))
          .distinct().collect().map(_.getString(0)).toSet
      case None => priorParentKeys(hub, batch)
    }
  }

  /** Durable record of the parent keys an IN-FLIGHT upload touches —
    * written BEFORE the hub upsert ([[graft.api.ClaimAnalysisEngine
    * .uploadBatch]]). The pre-upsert [[priorParentKeys]] probe exists
    * only in driver memory; if the process dies between the hub commit
    * and the completed mart refresh, a retry re-probes the ALREADY-
    * MERGED hub, finds only the claims' NEW locations, and the vacated
    * document would stay stale forever. [[refreshIncremental]] unions
    * every journaled generation into its touched set and clears
    * exactly the generations it read once the refresh completes —
    * regenerating an already-fresh document is idempotent, so
    * replaying a stale journal entry is harmless. This is the marker
    * PREFIX: each call writes a fresh `<prefix>.<suffix>` generation
    * (see [[journalTouchedKeys]] for why replace is not an option).
    * Writers to one mart dir are expected to serialize (any
    * non-table-format parquet maintenance shares that constraint; the
    * streaming ingester's foreachBatch does so per query) — the
    * generation scheme additionally keeps a racing upload's COMPLETED
    * journal write from being clobbered or prematurely cleared. A
    * racing write still IN FLIGHT when a refresh's tmp sweep runs
    * fails loudly before that upload's hub upsert (see
    * [[clearTouchedJournals]]) — an availability trade, never a
    * consistency one; concurrent refreshes of one mart remain
    * undefined.
    */
  private[claims] val touchedJournalFile = "_graft_mart_pending_touch"

  def journalTouchedKeys(spark: org.apache.spark.sql.SparkSession,
      dir: String, keys: Set[String]): Unit = {
    if (keys.isEmpty) return
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // One base64 line per key (key text comes from raw claim values —
    // the line format must not trust it to be newline-free); the
    // generation lifecycle (fresh full-UUID names, union-read, sweep
    // of orphaned tmps) lives in [[GenerationJournal]].
    val b64 = java.util.Base64.getEncoder
    GenerationJournal.append(fs, root, touchedJournalFile,
      keys.toSeq.sorted.map(k => b64.encodeToString(k.getBytes("UTF-8"))))
  }

  /** Every journaled generation: (union of keys, the marker paths
    * read).
    */
  private def readTouchedJournals(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): (Set[String], Seq[org.apache.hadoop.fs.Path]) = {
    val b64 = java.util.Base64.getDecoder
    val (lines, markers) = GenerationJournal.readAll(fs,
      new org.apache.hadoop.fs.Path(dir), touchedJournalFile)
    (lines.map(l => new String(b64.decode(l), "UTF-8")).toSet, markers)
  }

  private def clearTouchedJournals(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, read: Seq[org.apache.hadoop.fs.Path]): Unit =
    GenerationJournal.clear(fs, new org.apache.hadoop.fs.Path(dir),
      touchedJournalFile, read)

  /** Journal of vacated-bucket deletes in flight ([[DeleteJournal]]):
    * an incremental refresh whose touched bucket ends up with ZERO
    * surviving documents (the bucket's only series vanished on a
    * parent-key move) is never visited by dynamic overwrite, so the
    * stale files are deleted explicitly — journaled first, so a crash
    * between the commit and the deletes is healed by the next refresh.
    */
  private[claims] val martPendingDeletesFile = "_graft_mart_pending_deletes"

  /** The hub rows whose series a refresh must rebuild — the touched
    * keys' rows, and ONLY theirs (a touched key with no rows left —
    * a parent-key move drained it — simply yields no document).
    *
    * The filter is DELIBERATELY the computed concat, not per-column
    * equalities Parquet could push down: the mart key is LOSSY
    * (components may contain the "_" separator — the fixture's own
    * "PLANT_A"/"CAT2_X" do — and Python-str null is the literal
    * "None"), so distinct parent tuples can share one mart key. The
    * keep-filter drops existing documents BY KEY, so the rebuild must
    * regenerate every tuple colliding into a touched key or the
    * collision partner's document is silently lost; only the concat
    * form matches exactly that set. Cost profile: one column-pruned
    * hub scan per refresh (Catalyst prunes the read to the handful of
    * columns [[build]] consumes — PlanAuditSpec pins it) — already
    * the delta-rebuild improvement over the reference's full
    * regenerate; row-group skipping on top would need an injective
    * key encoding the reference's schema forbids.
    */
  private[graft] def touchedRows(hub: DataFrame,
      touchedKeys: Set[String]): DataFrame =
    hub.filter(
      concat_ws("_", parentKeys.map(pyStr): _*).isin(touchedKeys.toSeq: _*))

  /** Untouched documents sharing a touched bucket, carried over
    * byte-equal by the refresh. The bucket filter prunes the parquet
    * read to the touched PARTITIONS (PlanAuditSpec pins the
    * PartitionFilters) — untouched buckets are never visited.
    */
  private[graft] def keepRows(existing: DataFrame,
      touchedBuckets: Set[Long], touchedKeys: Set[String]): DataFrame =
    existing
      .filter(col(bucketCol).isin(touchedBuckets.toSeq: _*))
      .filter(!col("key").isin(touchedKeys.toSeq: _*))
      .drop(bucketCol)

  /** Incremental view maintenance — the reference's INTENDED
    * per-series regeneration (docs/project_master.md:24), which its
    * implementation never achieved (core/storage.py:504+ regenerates
    * every document per upload). Regenerates ONLY the parent series
    * the `batch` touches and rewrites only their hash buckets; every
    * other document keeps its bytes.
    *
    * This is the HUB-SCAN form, kept for callers without a maintained
    * count store: its touched rebuild and spine probe each read the
    * (column-pruned) hub. [[UploadFlow]] routes through
    * [[refreshFromCounts]] instead, whose reads are counts-bounded —
    * prefer that path wherever a [[SeriesCounts]] store exists.
    *
    * VALIDITY GUARDS (any failing one runs the full rebuild instead):
    *  - first build (no mart, or no [[martMetaFile]] marker — a layout
    *    written before the marker existed — self-heals on the next
    *    refresh);
    *  - the mart's month spine (from the marker) differs from the
    *    hub's — the spine is GLOBAL (min→max receipt month over the
    *    whole hub), so a batch whose dates extend it changes every
    *    document's zero-filled history. A direct [[writeBucketedMart]]
    *    layout lands here too: its marker is spine-less, which never
    *    equals the hub's concrete spine;
    *  - the marker's bucket count differs from this call's `buckets` —
    *    the union of two hash layouts would file keys inconsistently.
    * Returns true when the incremental path ran, false on a full
    * rebuild — callers can alert when uploads keep forcing full
    * regenerations.
    *
    * `hub` must already contain the batch (refresh AFTER the hub
    * upsert, reading the merged truth — the reference's ordering).
    * `priorKeys` — the batch claims' PRE-upsert mart keys, from
    * [[priorParentKeys]] run against the hub BEFORE the upsert — makes
    * a parent-key move regenerate the document the claim left, not
    * only the one it arrived in; omitting it is safe only when uploads
    * never re-file an existing claim under new 플랜트/제품범주2/대분류.
    * Untouched documents are carried over byte-for-byte, INCLUDING
    * `meta.last_updated` — a document not updated keeps its original
    * stamp, where a full rebuild re-stamps everything with `asOf`
    * (spec-pinned; the honest reading of "last updated").
    */
  def refreshIncremental(hub: DataFrame, batch: DataFrame, asOf: String,
      dir: String, buckets: Int = 64,
      priorKeys: Set[String] = Set.empty): Boolean =
   // Leased (round-11 verdict item 4): a direct refresh racing a live
   // UploadFlow interleaved with its journal lifecycle silently; the
   // flow itself re-enters (it already holds the mart lease).
   MaintenanceLease.withLease(hub.sparkSession, dir) {
    val spark = hub.sparkSession
    val hubSpine = hub
      .withColumn("ym", date_format(col(ClaimsSchema.receiptDateCol), "yyyy-MM"))
      .filter(col("ym").isNotNull)
      .agg(min("ym"), max("ym")).collect()(0)
    val spineOpt =
      if (hubSpine.isNullAt(0)) None
      else Some((hubSpine.getString(0), hubSpine.getString(1)))
    refreshCore(spark, batch, dir, buckets, priorKeys, spineOpt,
      buildAll = () => build(hub, asOf),
      buildTouched = (keys, spine) =>
        build(touchedRows(hub, keys), asOf, Some(spine)))
   }

  /** The O(delta) refresh ([[graft.claims.UploadFlow]]'s path): same
    * semantics and guards as [[refreshIncremental]], with every
    * document rebuilt from the maintained [[SeriesCounts]] store —
    * NO hub argument at all, so no refresh-time hub scan exists to
    * mis-scope. The two previously-O(hub) costs become counts-bounded:
    *  - the global-spine probe aggregates count rows, not hub rows;
    *  - a spine-EXTENDING batch (the first upload of every month — the
    *    most common production event) still rewrites every document
    *    (all histories gain a month, so all buckets must change), but
    *    assembles them from #keys × #months count rows instead of
    *    rescanning the entire hub. It still returns false: every
    *    document was rebuilt and re-stamped, which is what the return
    *    value reports.
    * `counts` must be current with the merged hub
    * ([[SeriesCounts.applyPending]] first — UploadFlow orders this).
    */
  def refreshFromCounts(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, batch: DataFrame, asOf: String,
      dir: String, buckets: Int = 64,
      priorKeys: Set[String] = Set.empty): Boolean =
   // Leased like [[refreshIncremental]]; the flow re-enters.
   MaintenanceLease.withLease(spark, dir) {
    val spineRow = counts.filter(col("ym").isNotNull)
      .agg(min("ym"), max("ym")).collect()(0)
    val spineOpt =
      if (spineRow.isNullAt(0)) None
      else Some((spineRow.getString(0), spineRow.getString(1)))
    refreshCore(spark, batch, dir, buckets, priorKeys, spineOpt,
      buildAll = () => buildFromCounts(counts, asOf, spineOpt),
      buildTouched = (keys, spine) => buildFromCounts(
        counts.filter(concat_ws("_", parentKeys.map(pyStr): _*)
          .isin(keys.toSeq: _*)),
        asOf, Some(spine)))
   }

  /** Shared refresh skeleton: guards, journals, touched-set assembly,
    * keep∪rebuilt dynamic write, vacated-bucket deletes. `buildAll`
    * produces the full mart for the guard-forced rebuild;
    * `buildTouched(keys, spine)` the touched keys' documents only.
    */
  private def refreshCore(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, dir: String, buckets: Int,
      priorKeys: Set[String], spineOpt: Option[(String, String)],
      buildAll: () => DataFrame,
      buildTouched: (Set[String], (String, String)) => DataFrame): Boolean = {
    val martRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = martRoot
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // First build = no mart DATA yet; an existing-but-empty directory
    // (a caller's fresh mkdir) counts as absent, like HubStore.exists,
    // and so does one holding only `_`/`.`-prefixed markers — the
    // lease, journals, and meta land in this directory before the
    // first data write does.
    val firstBuild = !fs.exists(martRoot) ||
      !fs.listStatus(martRoot).exists { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
    def fullRebuild(): Boolean = {
      // STATIC overwrite: buckets whose documents all disappeared must
      // not survive as ghosts (the wipe also clears both journals —
      // every document is fresh after it). The complete meta marker
      // (buckets + spine) is stamped once, after the data commits —
      // a crash in between leaves a stale/absent marker, which the
      // next refresh reads as "rebuild again" (self-healing).
      writeBucketedMart(buildAll(), dir, buckets, spine = spineOpt)
      clearTouchedJournals(fs, dir, readTouchedJournals(fs, dir)._2)
      false
    }
    if (firstBuild || spineOpt.isEmpty) return fullRebuild()
    DeleteJournal.heal(fs, martRoot, martPendingDeletesFile)
    val valid = readMartMeta(fs, dir).exists {
      case (b, s) => b == buckets && s == spineOpt
    }
    if (!valid) return fullRebuild()
    val spine = spineOpt.get
    // Touched documents: the batch's parent-key set as mart keys, plus
    // the keys its claims were previously filed under (`priorKeys`),
    // plus any keys a CRASHED upload journaled before its hub upsert
    // ([[journalTouchedKeys]]) — the retry's own probe cannot refind
    // those in the merged hub. Only the generations READ here are
    // cleared at completion.
    val (journaled, journalFiles) = readTouchedJournals(fs, dir)
    val touchedKeys = batch
      .select(concat_ws("_", parentKeys.map(pyStr): _*).as("key"))
      .distinct().collect().map(_.getString(0)).toSet ++
      priorKeys ++ journaled
    if (touchedKeys.isEmpty) {
      clearTouchedJournals(fs, dir, journalFiles); return true
    }
    val existing = spark.read.parquet(dir)
    // Buckets of the touched keys, computed by the SAME xxhash64
    // expression the writer uses — never a hand-rolled reimplementation
    // that could drift from Spark's seed or encoding.
    val touchedBuckets = {
      import spark.implicits._
      touchedKeys.toSeq.toDF("key")
        .select(pmod(xxhash64(col("key")), lit(buckets)))
        .collect().map(_.getLong(0)).toSet
    }
    val rebuilt = buildTouched(touchedKeys, spine)
    val keep = keepRows(existing, touchedBuckets, touchedKeys)
    val out = graft.Checkpoint.pinTransient(
      keep.unionByName(rebuilt.select(keep.columns.map(col): _*)))
    try {
      writeBucketedMart(out, dir, buckets, dynamic = true)
      // Touched buckets with zero surviving documents were never
      // visited by the dynamic write — delete them (journaled). The
      // probe collects ≤ `buckets` longs off the pinned frame, never
      // the documents themselves.
      val outBuckets = out
        .select(pmod(xxhash64(col("key")), lit(buckets)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSet
      val vacated = (touchedBuckets -- outBuckets).toSeq.sorted
        .map(b => s"$bucketCol=$b")
      DeleteJournal.journalThenDelete(fs, martRoot,
        martPendingDeletesFile, vacated)
      // The refresh is complete: every journal generation read at the
      // start has been honored (a generation a racing upload wrote
      // AFTER the read survives for that upload's own refresh).
      clearTouchedJournals(fs, dir, journalFiles)
    } finally graft.Checkpoint.release(out)
    true
  }

  /** Reference-layout export: one pretty JSON file per key with the
    * sanitized filename (ref: core/storage.py:643-648). Driver-side by
    * design — the shipped mart is ~5k small files.
    */
  def writePerKeyFiles(mart: DataFrame, dir: String): Int = {
    val out = new java.io.File(dir)
    out.mkdirs()
    var written = 0
    val it = mart.toJSON.collectAsList().iterator()
    val keyRe = "\"filename_key\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
    // Distinct keys can SANITIZE to the same filename ("A/B" and
    // "A:B" both become "A-B"); without disambiguation the second
    // write silently overwrote the first while `written` counted both.
    val used = scala.collection.mutable.Map.empty[String, Int]
    while (it.hasNext) {
      val json = it.next()
      val fn0 = keyRe.findFirstMatchIn(json).map(_.group(1)).getOrElse("unknown")
      val n = used.getOrElse(fn0, 0)
      used(fn0) = n + 1
      val fn = if (n == 0) fn0 else s"$fn0-$n"
      val cleaned = json.replaceFirst(",?\"filename_key\":\"(?:[^\"\\\\]|\\\\.)*\"", "")
      val f = new java.io.File(out, s"$fn.json")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(cleaned) finally w.close()
      written += 1
    }
    written
  }
}
