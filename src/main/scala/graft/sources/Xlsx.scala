package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Minimal XLSX ingest/export (S2/S10) over the JDK's zip + StAX — an
  * .xlsx file is a zip of SpreadsheetML parts (ECMA-376, public spec).
  * The reference's primary upload path is Excel
  * (ref: core/etl.py:39-40 `pd.read_excel`; pages/1:37) and its export
  * is an Excel download (ref: app.py:509-516).
  *
  * Scale posture: a user-uploaded workbook is a driver-sized artifact
  * (Excel itself caps at ~1M rows) — parsing it on the driver and
  * parallelizing the rows is the honest shape; bulk 100 TB ingest goes
  * through the CSV/parquet paths. Reading is streaming (StAX, one pass,
  * no DOM), so memory is bounded by the sheet's cell text, not XML
  * overhead.
  *
  * Supported: shared strings, inline strings, numbers, booleans, the
  * first worksheet, missing-cell gaps (by cell reference), and date
  * serial decoding — numeric cells whose style resolves to a date
  * number format (styles.xml) arrive as ISO date / datetime strings,
  * matching what `pd.read_excel` hands the reference's ETL
  * (ref: core/etl.py:39-40). Not supported (not needed by the
  * reference's data files): formulas (cached values are read).
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    // not interested in DTDs; also hardens against XXE in untrusted files
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** Column index (0-based) from an A1-style cell reference. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** 0-based column index → A1 letters. */
  private[sources] def colLetters(idx: Int): String = {
    var n = idx + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Style indices (cellXfs order) whose number format is a date/time
    * format — builtin ids 14–22, 27–36, 45–47 plus custom formats whose
    * code contains a date token (y/m/d/h/s) outside quoted literals,
    * backslash escapes, and bracket sections (the same heuristic
    * mainstream readers use; ECMA-376 §18.8.30 for the builtin table).
    */
  private def readDateStyles(in: InputStream): Set[Int] = {
    val builtinDate: Set[Int] = ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet
    def isDateCode(code: String): Boolean = {
      val sb = new StringBuilder
      var i = 0
      var inQuote = false
      var inBracket = false
      while (i < code.length) {
        val c = code.charAt(i)
        if (inQuote) { if (c == '"') inQuote = false }
        else if (inBracket) { if (c == ']') inBracket = false }
        else c match {
          case '"' => inQuote = true
          case '[' => inBracket = true
          case '\\' => i += 1 // escaped literal char
          case _ => sb.append(c)
        }
        i += 1
      }
      val bare = sb.toString.toLowerCase
      // presence of a bare date token letter; numeric masks (#/0/E/%/@)
      // never contain these outside literals
      "ymdhs".exists(bare.contains(_))
    }
    val customDate = scala.collection.mutable.Set.empty[Int]
    val dateStyles = scala.collection.mutable.Set.empty[Int]
    var inCellXfs = false
    var xfIdx = 0
    val r = factory.createXMLStreamReader(in)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              for {
                id <- Option(r.getAttributeValue(null, "numFmtId"))
                code <- Option(r.getAttributeValue(null, "formatCode"))
                if isDateCode(code)
              } customDate += id.trim.toInt
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              val fmt = Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.trim.toInt).getOrElse(0)
              if (builtinDate(fmt) || customDate(fmt)) dateStyles += xfIdx
              xfIdx += 1
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    r.close()
    dateStyles.toSet
  }

  /** Excel 1900-system serial → ISO string. Epoch 1899-12-30 with the
    * Lotus leap-year quirk: serials 1–59 shift one day (so 1 →
    * 1900-01-01), the phantom 1900-02-29 (serial 60) lands on 02-28,
    * and 61+ are exact — the openpyxl/pandas mapping. A fractional part
    * is a time of day; out-of-range serials fall back to the raw text.
    */
  private[sources] def decodeSerial(raw: String,
      date1904: Boolean = false): String = {
    val d = raw.trim.toDouble
    // 9999-12-31 bound is epoch-dependent: serial 2958465 in the 1900
    // system, 2957003 (= 2958465 − 1462, the 1899-12-30→1904-01-01
    // gap) in the 1904 system — the same serial maps ~4 years later
    // there, so the 1900 bound alone would admit year-10000+ dates.
    val bound = if (date1904) 2957003.999999 else 2958465.999999
    if (d < 0 || d > bound) return raw
    val days = math.floor(d).toLong
    // 1904 system (workbookPr date1904: Mac-origin workbooks): epoch
    // 1904-01-01, no Lotus phantom-leap-day adjustment. pd.read_excel
    // honors the flag; ignoring it shifted every date ~4 years.
    val date =
      if (date1904) java.time.LocalDate.of(1904, 1, 1).plusDays(days)
      else {
        val adjusted = if (days < 60) days + 1 else days
        java.time.LocalDate.of(1899, 12, 30).plusDays(adjusted)
      }
    val secs = math.round((d - days) * 86400)
    if (secs == 0) date.toString
    else if (secs >= 86400) date.plusDays(1).toString + " 00:00:00"
    else {
      val t = java.time.LocalTime.ofSecondOfDay(secs)
      s"$date ${"%02d:%02d:%02d".format(t.getHour, t.getMinute, t.getSecond)}"
    }
  }

  /** Shared-strings table: one entry per <si>, concatenating its <t>
    * runs (rich-text items carry several). Phonetic <rPh> runs are
    * skipped, matching mainstream readers.
    */
  private def readSharedStrings(in: InputStream): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = factory.createXMLStreamReader(in)
    val sb = new StringBuilder
    var inT = false
    var skip = 0 // depth inside rPh/rPhoneticPr
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "rPh" | "phoneticPr" => skip += 1
            case "t" if skip == 0 => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += sb.toString
            case "rPh" | "phoneticPr" => skip -= 1
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** One worksheet → rows of Option[String] cells, gaps preserved.
    * Numeric cells whose style index is in `dateStyles` decode their
    * serial to an ISO date/datetime string.
    */
  private def readSheet(in: InputStream, shared: Vector[String],
      dateStyles: Set[Int],
      date1904: Boolean): ArrayBuffer[ArrayBuffer[Option[String]]] = {
    val rows = ArrayBuffer.empty[ArrayBuffer[Option[String]]]
    val r = factory.createXMLStreamReader(in)
    var row: ArrayBuffer[Option[String]] = null
    var cellCol = 0
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def setCell(): Unit = {
      val raw = text.toString
      val value = cellType match {
        case "s" => shared.lift(raw.trim.toInt).getOrElse("")
        case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
        case "" | "n" if dateStyles(cellStyle) =>
          try decodeSerial(raw, date1904)
          catch { case _: NumberFormatException => raw }
        case _ => raw
      }
      while (row.length <= cellCol) row += None
      row(cellCol) = Some(value)
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .map(_.trim.toInt).getOrElse(-1)
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || inIsT) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += row; row = null
            case "c" => if (text.nonEmpty || cellType == "inlineStr") setCell()
            case "v" => inV = false
            case "t" => inIsT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows
  }

  /** First worksheet's path inside the archive: workbook.xml's first
    * <sheet r:id> resolved through workbook.xml.rels; falls back to the
    * conventional xl/worksheets/sheet1.xml.
    */
  private def firstSheetPath(zip: ZipFile): String = {
    def attr(r: XMLStreamReader, name: String): Option[String] =
      (0 until r.getAttributeCount)
        .find(i => r.getAttributeLocalName(i) == name)
        .map(r.getAttributeValue)
    val firstRid = Option(zip.getEntry("xl/workbook.xml")).flatMap { e =>
      val r = factory.createXMLStreamReader(zip.getInputStream(e))
      var rid: Option[String] = None
      while (r.hasNext && rid.isEmpty) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
          rid = attr(r, "id")
      }
      r.close()
      rid
    }
    val resolved = for {
      rid <- firstRid
      e <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      target <- {
        val r = factory.createXMLStreamReader(zip.getInputStream(e))
        var t: Option[String] = None
        while (r.hasNext && t.isEmpty) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            attr(r, "Id").contains(rid))
            t = attr(r, "Target")
        }
        r.close()
        t
      }
    } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    resolved.getOrElse("xl/worksheets/sheet1.xml")
  }

  /** Does workbook.xml declare the 1904 date system
    * (`<workbookPr date1904="1"/>` / `"true"`)?
    */
  private def readDate1904(zip: ZipFile): Boolean =
    Option(zip.getEntry("xl/workbook.xml")).exists { e =>
      val r = factory.createXMLStreamReader(zip.getInputStream(e))
      var flag = false
      var done = false
      while (r.hasNext && !done) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "workbookPr") {
          flag = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "date1904")
            .map(r.getAttributeValue)
            .exists(v => v == "1" || v.equalsIgnoreCase("true"))
          done = true
        }
      }
      r.close()
      flag
    }

  /** Read the first worksheet as a DataFrame: row 1 = header, all
    * columns string-typed (pandas `object` parity — the canonicalize
    * step downstream owns typing), absent cells null.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => readSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val dateStyles = Option(zip.getEntry("xl/styles.xml"))
        .map(e => readDateStyles(zip.getInputStream(e)))
        .getOrElse(Set.empty)
      val sheetEntry = Option(zip.getEntry(firstSheetPath(zip)))
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no worksheet found"))
      val rows = readSheet(zip.getInputStream(sheetEntry), shared,
        dateStyles, readDate1904(zip))
      require(rows.nonEmpty, s"$path: empty sheet")
      val header = rows.head.map(_.getOrElse(""))
      val width = math.max(header.length, if (rows.length > 1) rows.tail.map(_.length).max else 0)
      // Duplicate header cells mangle pandas-style (name, name.1, ...):
      // hand-edited sheets repeat columns, and duplicate DataFrame
      // names would crash canonicalize54 downstream with an
      // ambiguous-reference error instead of dropping the extras.
      val names = {
        val base = (0 until width).map(i =>
          header.lift(i).filter(_.nonEmpty).getOrElse(s"_c$i"))
        val seen = scala.collection.mutable.Map.empty[String, Int]
        base.map { n =>
          val k = seen.getOrElse(n, 0)
          seen(n) = k + 1
          if (k == 0) n else s"$n.$k"
        }
      }
      val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
      val data = rows.tail.map { r =>
        Row.fromSeq((0 until width).map(i => r.lift(i).flatten.orNull))
      }
      spark.createDataFrame(data.toList.asJava, schema)
    } finally zip.close()
  }

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Write a DataFrame as a single-sheet .xlsx (inline strings — no
    * shared-strings part needed). Driver-side export, the engine twin
    * of the reference's Excel download (ref: app.py:509-516): the input
    * is a filtered, bounded result frame, not a corpus.
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val cols = df.columns
    val rows = df.collect()
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def appendRow(rowIdx: Int, cells: Seq[Any]): Unit = {
        sb.append(s"""<row r="$rowIdx">""")
        cells.zipWithIndex.foreach { case (v, i) =>
          if (v != null) {
            val ref = colLetters(i) + rowIdx
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">""")
            sb.append(xmlEscape(v.toString))
            sb.append("</t></is></c>")
          }
        }
        sb.append("</row>")
      }
      appendRow(1, cols.toSeq)
      rows.zipWithIndex.foreach { case (r, i) => appendRow(i + 2, r.toSeq) }
      sb.append("</sheetData></worksheet>")
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
