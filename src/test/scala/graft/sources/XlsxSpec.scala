package graft.sources

import java.nio.file.Files

import graft.claims.{ClaimsEtl, ClaimsSchema}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** XLSX ingest/export (S2/S10): writer→reader roundtrip, cell-type
  * handling, gap preservation, and the ClaimsEtl seam (xlsx upload →
  * canonicalize54), mirroring the reference's pd.read_excel path
  * (ref: core/etl.py:39-40).
  */
class XlsxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("column reference helpers") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("AZ3") == 51)
    assert(Xlsx.colLetters(0) == "A")
    assert(Xlsx.colLetters(25) == "Z")
    assert(Xlsx.colLetters(26) == "AA")
    assert(Xlsx.colLetters(51) == "AZ")
  }

  test("writer → reader roundtrip preserves values, nulls, and unicode") {
    import spark.implicits._
    val path = Files.createTempDirectory("xlsx").resolve("t.xlsx").toString
    val df = Seq(
      ("C001", "접수", "12.5"),
      ("C002", null, "3"),
      ("C003", "a<b&\"c\">", "")
    ).toDF("상담번호", "등급기준", "수량")
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("상담번호", "등급기준", "수량"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("C001", "접수", "12.5"),
      ("C002", null, "3"),
      ("C003", "a<b&\"c\">", "")))
  }

  test("reader handles shared strings, booleans, and missing cells by reference") {
    // hand-built workbook exercising t="s", t="b", numeric cells, and a
    // row that skips column B entirely (gap must read back as null)
    val path = Files.createTempDirectory("xlsx").resolve("m.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>id</t></si><si><t>flag</t></si><si><t>n</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2" t="b"><v>1</v></c><c r="C2"><v>42</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>0</v></c><c r="C3"><v>7.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "flag", "n"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("rich", "TRUE", "42"), ("id", null, "7.5")))
  }

  test("serial decoding maps the 1900 epoch with the Lotus leap quirk") {
    assert(Xlsx.decodeSerial("1") == "1900-01-01")
    assert(Xlsx.decodeSerial("59") == "1900-02-28")
    assert(Xlsx.decodeSerial("60") == "1900-02-28") // phantom 1900-02-29
    assert(Xlsx.decodeSerial("61") == "1900-03-01")
    assert(Xlsx.decodeSerial("45292") == "2024-01-01")
    assert(Xlsx.decodeSerial("45297.5") == "2024-01-06 12:00:00")
    assert(Xlsx.decodeSerial("-3") == "-3") // out of range → raw passthrough
    // The 9999-12-31 bound is epoch-dependent: 2958465 in the 1900
    // system but 2957003 in the 1904 system (same serial maps ~4 years
    // later there). A 1904-mode serial past its own bound must fall
    // back to raw, not produce a year-10000+ date.
    assert(Xlsx.decodeSerial("2958465") == "9999-12-31")
    assert(Xlsx.decodeSerial("2958466") == "2958466")
    assert(Xlsx.decodeSerial("2957003", date1904 = true) == "9999-12-31")
    assert(Xlsx.decodeSerial("2957004", date1904 = true) == "2957004")
    assert(Xlsx.decodeSerial("2958465", date1904 = true) == "2958465")
  }

  test("date-styled numeric cells decode to ISO strings, others stay raw") {
    // hand-built workbook with styles.xml: builtin date (14), datetime
    // (22), a custom Korean date format, a custom plain-decimal format,
    // and the default general style — only date-styled cells decode.
    val path = Files.createTempDirectory("xlsx").resolve("d.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>d14</t></si><si><t>d164</t></si><si><t>plain</t></si><si><t>gen</t></si><si><t>dt22</t></si></sst>""")
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="yyyy&quot;년&quot; m&quot;월&quot; d&quot;일&quot;"/>
        |<numFmt numFmtId="165" formatCode="#,##0.00"/>
        |</numFmts>
        |<cellXfs count="5">
        |<xf numFmtId="0"/>
        |<xf numFmtId="14" applyNumberFormat="1"/>
        |<xf numFmtId="164" applyNumberFormat="1"/>
        |<xf numFmtId="165" applyNumberFormat="1"/>
        |<xf numFmtId="22" applyNumberFormat="1"/>
        |</cellXfs>
        |</styleSheet>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c><c r="E1" t="s"><v>4</v></c></row>
        |<row r="2"><c r="A2" s="1"><v>45297</v></c><c r="B2" s="2"><v>45297</v></c><c r="C2" s="3"><v>45297</v></c><c r="D2" s="0"><v>45297</v></c><c r="E2" s="4"><v>45297.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val back = Xlsx.read(spark, path)
    val r = back.collect()(0)
    assert(r.getString(0) == "2024-01-06")          // builtin date
    assert(r.getString(1) == "2024-01-06")          // custom date format
    assert(r.getString(2) == "45297")               // custom decimal stays raw
    assert(r.getString(3) == "45297")               // general stays raw
    assert(r.getString(4) == "2024-01-06 12:00:00") // builtin datetime
  }

  test("date1904 workbooks decode serials from the 1904 epoch") {
    // Mac-origin workbook: <workbookPr date1904="1"/>. Serial 43737 in
    // the 1904 system is 2023-10-02 (1904-01-01 + 43737 days); the
    // 1900-system reading would be 2019-09-29 — ~4 years off.
    val path = Files.createTempDirectory("xlsx").resolve("m.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><workbookPr date1904="1"/><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>d</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>43737</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val r = Xlsx.read(spark, path).collect()(0)
    assert(r.getString(0) ==
      java.time.LocalDate.of(1904, 1, 1).plusDays(43737).toString)
    assert(Xlsx.decodeSerial("43737") != r.getString(0),
      "1900- and 1904-system readings must differ")
  }

  test("duplicate header cells mangle pandas-style instead of colliding") {
    import spark.implicits._
    val path = Files.createTempDirectory("xlsx").resolve("dup.xlsx").toString
    Xlsx.write(Seq(("a", "b", "c")).toDF("제품명", "제품명", "x"), path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("제품명", "제품명.1", "x"))
    // the canonicalize seam that used to crash on AMBIGUOUS_REFERENCE
    val canon = ClaimsEtl.canonicalize54(back)
    assert(canon.columns.count(_ == "제품명") == 1)
  }

  test("serial-dated upload canonicalizes to a real date through ClaimsEtl") {
    import org.apache.spark.sql.functions.col
    // An Excel-authored claims sheet delivers 접수일 as a date-styled
    // serial; after decode it must parse through canonicalize54's
    // multi-format date path rather than nulling out.
    val path = Files.createTempDirectory("xlsx").resolve("ds.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>상담번호</t></si><si><t>접수일</t></si><si><t>C777</t></si></sst>""")
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" s="1"><v>45297</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val canon = ClaimsEtl.canonicalize54(ClaimsEtl.loadExcel(spark, path))
    val got = canon.select(col("상담번호"), col("접수일").cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("C777", "2024-01-06")))
  }

  test("xlsx upload flows through the ClaimsEtl seam into canonicalize54") {
    import spark.implicits._
    val path = Files.createTempDirectory("xlsx").resolve("claims.xlsx").toString
    val df = Seq(
      ("C001", "2024-01-05", "보증"),
      ("C002", "2024-02-07", "일반")
    ).toDF("상담번호", "접수일", "등급기준")
    Xlsx.write(df, path)
    val canon = ClaimsEtl.canonicalize54(ClaimsEtl.loadExcel(spark, path))
    assert(canon.columns.filterNot(_ == ClaimsSchema.ingestSeqCol).length == 54)
    val got = canon.select("상담번호", "등급기준").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("C001", "보증"), ("C002", "일반")))
  }
}
