package graft

import graft.sources.Workbook
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** S4 — Excel-era reader options: skiprows preamble, sheet selection, and
  * ragged-footer BLOCK semantics (everything at and below the first
  * unparseable key row is dropped, parseable rows included). */
class WorkbookSpec extends SparkSpec {

  private def writeSheet(dir: String, sheet: String, lines: Seq[String]): Unit = {
    val p = Paths.get(dir, s"$sheet.csv")
    Files.createDirectories(p)
    Files.write(p.resolve("part-00000.txt"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  test("skiprows + dynamic footer block + sheet selection") {
    val dir = Files.createTempDirectory("wb").toString
    writeSheet(dir, "Data", Seq(
      "preamble 0",
      "preamble 1",
      "Year,Val",
      "2001,10.5",
      "2002,",          // empty cell survives as null-ish string
      "2003,12.25",
      "Note: footer",   // footer starts here (Year unparseable)
      "9999,99.9"))     // parseable, but BELOW the footer start: dropped
    writeSheet(dir, "Notes", Seq("decoy,sheet"))

    val df = Workbook.readSheet(spark, dir, "Data",
      skipRows = 2, footerKey = Some("Year"))
    assert(df.columns.toSeq === Seq("Year", "Val"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq === Seq(("2001", "10.5"), ("2002", ""), ("2003", "12.25")))
  }

  test("footer block BEGINNING with a blank separator row still triggers") {
    val dir = Files.createTempDirectory("wb3").toString
    writeSheet(dir, "Data", Seq(
      "Year,Val",
      "2001,10.5",
      "2002,11.0",
      "",               // blank separator — the BART-matrix footer shape
      "2010,1234"))     // parseable TOTALS row below the blank: must drop
    val df = Workbook.readSheet(spark, dir, "Data",
      skipRows = 0, footerKey = Some("Year"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq === Seq(("2001", "10.5"), ("2002", "11.0")),
      s"totals row below the blank separator leaked: ${rows.toSeq}")
  }

  test("mid-data blank row truncates the rest of the block (documented)") {
    // a blank row INSIDE the data region is indistinguishable from a
    // footer separator at read time; the documented contract (see
    // Workbook.readSheet) is that it starts the footer and everything
    // below is dropped — a malformed sheet truncates loudly-by-count
    // rather than silently re-including post-blank rows
    val dir = Files.createTempDirectory("wb4").toString
    writeSheet(dir, "Data", Seq(
      "Year,Val",
      "2001,10.5",
      "",               // malformed: blank inside the data block
      "2002,11.0",      // parseable but below the blank: dropped
      "2003,12.0"))
    val df = Workbook.readSheet(spark, dir, "Data",
      skipRows = 0, footerKey = Some("Year"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("2001", "10.5")))
  }

  test("no footerKey keeps every post-header row") {
    val dir = Files.createTempDirectory("wb2").toString
    writeSheet(dir, "Data", Seq("K,V", "1,a", "x,b"))
    val df = Workbook.readSheet(spark, dir, "Data")
    assert(df.count() === 2)
  }
}
