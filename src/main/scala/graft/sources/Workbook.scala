package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S4 — Excel-era workbook reader semantics over CSV-per-sheet fixtures
  * (SURVEY.md §2.1).
  *
  * The reference reads its CPI and BART-exit workbooks with
  * `pd.read_excel(sheetname='BLS Data Series', skiprows=11)`
  * (DemandHelper.py:1537) and with a CONTENT-DERIVED footer length — the
  * station count is found from the header and `skip_footer` is whatever
  * remains below the matrix (MultiModalHelper.py:381-387). Fixtures here
  * are one CSV per sheet inside a workbook directory; this reader keeps
  * the Excel-era semantics as options:
  *
  *   - `sheet`     — which per-sheet CSV of the workbook directory to read
  *                   (read_excel's sheetname);
  *   - `skipRows`  — physical preamble lines dropped before the header row
  *                   (read_excel's skiprows);
  *   - `footerKey` — dynamic footer detection: the data block ends at the
  *                   FIRST post-header row whose key column fails to parse
  *                   as a number; that row AND EVERYTHING BELOW IT is
  *                   dropped, even rows that would parse (read_excel's
  *                   skip_footer=N block semantics, with N derived from
  *                   content like the BART ragged footer of notes/totals).
  *
  * Execution shape: a workbook is a config-scale file — the reference
  * holds the whole sheet in one pandas frame — so the sheet is read
  * `wholetext` (one row per file) and exploded to (lineno, line), which
  * gives STABLE line numbers; a plain distributed text read has no order
  * guarantee, which is exactly why skiprows needs this shape. The one
  * `.first()` fetches the header line to become the schema — the same
  * driver-side step Spark's own CSV header inference performs. Cells are
  * split on bare commas (fixture sheets carry no quoted fields) and
  * returned as trimmed strings; type coercion is the caller's, matching
  * the reference's post-read `astype` calls.
  */
object Workbook {

  def readSheet(
      spark: SparkSession, dir: String, sheet: String,
      skipRows: Int = 0, footerKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(s"$dir/$sheet.csv")
    // blank lines are KEPT here: a footer block that begins with an empty
    // separator row (the BART-matrix shape) must still trigger footer
    // detection — the blank row's key cell try_casts to null like any
    // other non-numeric footer line, dropping it and everything below.
    // Blanks are excluded from the returned data at the end.
    val lines = raw
      .select(input_file_name().as("__file"),
        posexplode(split(col("value"), "\r?\n")).as(Seq("__lineno", "__line")))
      .where(col("__lineno") >= skipRows)
      .withColumn("__blank", length(trim(col("__line"))) === 0)
    // one header row per matched file, collected driver-side (one short
    // string per file — the same driver step CSV header inference does).
    // Diagnosable failures instead of a bare NoSuchElement: a sheet whose
    // row at `skipRows` is blank/absent, or a glob whose files disagree
    // on the header, would otherwise silently mis-name every column.
    val headers = lines.where(col("__lineno") === skipRows && !col("__blank"))
      .select(col("__line")).distinct().as[String].collect()
    require(headers.nonEmpty,
      s"workbook sheet '$sheet': no non-empty header line at row $skipRows " +
        "(check skipRows against the sheet's preamble)")
    require(headers.length == 1,
      s"workbook sheet '$sheet': files matched by the glob disagree on the " +
        s"header at row $skipRows: ${headers.take(2).mkString(" vs ")}")
    val names = headers.head.split(",", -1).map(_.trim)
    val parts = split(col("__line"), ",", -1)
    val data0 = lines.where(col("__lineno") > skipRows)
      .select(Seq(col("__file"), col("__lineno"), col("__blank")) ++
        names.zipWithIndex.map { case (n, i) =>
          // try_element_at: ragged rows (the footer notes line is shorter
          // than the header) must yield null cells, not ANSI index errors
          trim(try_element_at(parts, lit(i + 1))).as(n)
        }: _*)
    val data = footerKey match {
      case None => data0.where(!col("__blank"))
      case Some(k) =>
        // per-file window (not a global one): the canary-safe shape, and
        // correct if a glob ever matches several sheet files
        val w = Window.partitionBy(col("__file"))
        // INTENTIONAL: a blank row anywhere after the header starts the
        // footer — blanks reach detection un-filtered so a footer block
        // that OPENS with its blank separator line still triggers (the
        // BART workbook shape). Corollary: a blank row in the middle of
        // the data block truncates everything below it, exactly like
        // the reference's read_excel footer handling of a sheet whose
        // data region ends at the first non-parsing row; mid-data
        // blanks are a malformed sheet, not a supported layout
        // (WorkbookSpec pins both behaviors).
        val badLine = when(col(k).try_cast("double").isNull, col("__lineno"))
        data0
          .withColumn("__footer_start", min(badLine).over(w))
          .where(col("__footer_start").isNull ||
            col("__lineno") < col("__footer_start"))
          .where(!col("__blank"))
          .drop("__footer_start")
    }
    data.drop("__file", "__lineno", "__blank")
  }
}
