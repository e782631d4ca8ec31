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
