package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — the reference's STP fixed-width column registry as data: the full
  * declared colspec table (SFMuniDataHelper.py:71-170 — name, python
  * half-open [start, end) byte positions, dtype, string length), the
  * default read set (the first 62 columns through PULLOUT_INT,
  * SFMuniDataHelper.py:67-68), the 2 header rows (:56), the misaligned-row
  * type-forcing rules (:475-485: int64 parses via float64 then truncates;
  * object forces string), and the revenue-service row filters (:488-496).
  *
  * Quirks preserved faithfully: LOADCODE is declared with a ZERO-width
  * window (67,67) — the reference reads it as an empty object column —
  * and most adjacent windows leave a 1-byte gap (the files carry a space
  * separator), which the writer must emit to keep positions aligned.
  */
object StpRegistry {

  /** One registry row: python [start, end) positions and pandas dtype
    * kind ('I' int64, 'F' float64, 'S' object). */
  final case class Entry(name: String, start: Int, end: Int, kind: Char)

  // transcribed 1:1 from SFMuniDataHelper.py:71-170 (98 columns)
  val entries: Seq[Entry] = Seq(
    Entry("SEQ", 0, 5, 'I'), Entry("V2", 6, 10, 'I'),
    Entry("STOP_AVL", 10, 14, 'I'), Entry("STOPNAME_AVL", 15, 47, 'S'),
    Entry("ARRIVAL_TIME_INT", 48, 54, 'I'), Entry("ON", 55, 58, 'I'),
    Entry("OFF", 59, 62, 'I'), Entry("LOAD_DEP", 63, 66, 'I'),
    Entry("LOADCODE", 67, 67, 'S'), Entry("DATE_INT", 68, 74, 'I'),
    Entry("ROUTE_AVL", 75, 79, 'I'), Entry("PATTERN", 80, 86, 'S'),
    Entry("BLOCK", 87, 93, 'I'), Entry("LAT", 94, 102, 'F'),
    Entry("LON", 103, 112, 'F'), Entry("MILES", 113, 118, 'F'),
    Entry("TRIP", 119, 123, 'I'), Entry("DOORCYCLES", 124, 125, 'I'),
    Entry("DELTA", 126, 130, 'I'), Entry("DOW", 131, 132, 'I'),
    Entry("DIR", 133, 134, 'I'), Entry("SERVMILES", 135, 140, 'F'),
    Entry("DLPMIN", 141, 145, 'F'), Entry("PASSMILES", 146, 153, 'F'),
    Entry("PASSHOURS", 154, 160, 'F'), Entry("VEHNO", 161, 165, 'I'),
    Entry("LINE", 166, 170, 'I'), Entry("DBNN", 171, 175, 'I'),
    Entry("ARRIVAL_TIME_S_INT", 176, 180, 'I'),
    Entry("RUNTIME_S", 181, 186, 'F'), Entry("RUNTIME", 187, 192, 'F'),
    Entry("ODOM", 193, 198, 'F'), Entry("GODOM", 199, 204, 'F'),
    Entry("ARRIVAL_TIME_DEV", 205, 211, 'F'), Entry("DWELL", 212, 217, 'F'),
    Entry("MSFILE", 218, 226, 'S'), Entry("QC101", 227, 230, 'I'),
    Entry("QC104", 231, 234, 'I'), Entry("QC201", 235, 238, 'I'),
    Entry("AQC", 239, 242, 'I'), Entry("RECORD", 243, 244, 'S'),
    Entry("WHEELCHAIR", 245, 246, 'I'), Entry("BIKERACK", 247, 248, 'I'),
    Entry("SP2", 249, 250, 'I'), Entry("V51", 251, 257, 'I'),
    Entry("VERSN", 258, 263, 'I'), Entry("DEPARTURE_TIME_INT", 264, 270, 'I'),
    Entry("UON", 271, 274, 'I'), Entry("UOFF", 275, 278, 'I'),
    Entry("CAPACITY", 279, 283, 'I'), Entry("OVER", 284, 288, 'I'),
    Entry("NS", 289, 290, 'S'), Entry("EW", 291, 292, 'S'),
    Entry("MAXVEL", 293, 296, 'F'), Entry("RDBRDNGS", 297, 301, 'I'),
    Entry("DV", 302, 304, 'I'), Entry("PATTCODE", 305, 315, 'S'),
    Entry("DWDI", 316, 320, 'F'), Entry("RUN", 321, 328, 'I'),
    Entry("SCHOOL", 329, 335, 'S'), Entry("TRIPID_2", 336, 344, 'I'),
    Entry("PULLOUT_INT", 345, 351, 'I'),
    Entry("DEPARTURE_TIME_S_INT", 352, 356, 'I'),
    Entry("DEPARTURE_TIME_DEV", 357, 363, 'F'), Entry("DWELL_S", 364, 368, 'I'),
    Entry("RECOVERY_S", 369, 374, 'F'), Entry("RECOVERY", 375, 380, 'F'),
    Entry("POLITICAL", 381, 390, 'S'), Entry("DELTAA", 391, 397, 'I'),
    Entry("DELTAD", 398, 404, 'I'), Entry("ECNT", 405, 409, 'I'),
    Entry("MC", 410, 412, 'I'), Entry("DIV", 413, 416, 'I'),
    Entry("LASTTRIP", 417, 421, 'I'), Entry("NEXTTRIP", 422, 426, 'I'),
    Entry("V86", 427, 430, 'S'), Entry("TRIPID_3", 431, 441, 'I'),
    Entry("WCC", 442, 445, 'I'), Entry("BRC", 446, 449, 'I'),
    Entry("DWELLI", 450, 455, 'I'), Entry("QC202", 456, 459, 'I'),
    Entry("QC302", 460, 463, 'I'), Entry("QC303", 464, 467, 'I'),
    Entry("QC206", 468, 471, 'I'), Entry("QC207", 472, 475, 'I'),
    Entry("DGFT", 476, 481, 'I'), Entry("DGM", 482, 485, 'I'),
    Entry("DGH", 486, 489, 'I'), Entry("LRSE", 490, 494, 'I'),
    Entry("LRFT", 495, 499, 'I'), Entry("ARRIVEP", 500, 507, 'I'),
    Entry("DEPARTP", 508, 515, 'I'), Entry("DWELLP", 516, 522, 'I'),
    Entry("NRSE", 523, 527, 'I'), Entry("NRFT", 528, 533, 'I'),
    Entry("SC", 534, 536, 'I'), Entry("T_MILE", 537, 543, 'I'),
    Entry("CARS", 544, 547, 'I'))

  /** Rows at the top of every file to skip (SFMuniDataHelper.py:56). */
  val HeaderRows = 2

  /** The reference's default read set: the first 62 columns, through
    * PULLOUT_INT (SFMuniDataHelper.py:67-68). */
  def defaultColumns: Seq[Entry] = entries.take(62)

  /** Registry entries → the reader's ColSpecs. int64 columns parse as
    * DOUBLE first — the misaligned-row forcing rule
    * (SFMuniDataHelper.py:480-484 casts float64 then int64, so '12.0'
    * and '12' both land on 12) — and are truncated to long in read(). */
  def readerSpecs(cols: Seq[Entry]): Seq[FixedWidth.ColSpec] =
    cols.map { e =>
      val typ = e.kind match {
        case 'I' | 'F' => DoubleType
        case _         => StringType
      }
      FixedWidth.ColSpec(e.name, e.start + 1, e.end - e.start, typ)
    }

  /** Writer ColSpecs for round-tripping fixtures: same windows; the
    * inter-column gaps are emitted by FixedWidth.formatLine from the
    * absolute start positions. */
  def writerSpecs(cols: Seq[Entry]): Seq[FixedWidth.ColSpec] =
    cols.map { e =>
      val typ = e.kind match {
        case 'I' => LongType
        case 'F' => DoubleType
        case _   => StringType
      }
      FixedWidth.ColSpec(e.name, e.start + 1, e.end - e.start, typ)
    }

  /** Read an STP file with the registry schema: positions from the
    * table, na-nulling for repeated header text, int64 truncation per
    * the forcing rules. Callers drop the HeaderRows/mid-file headers via
    * the SEQ null filter, exactly the reference's
    * `na_values=['ID'] + dropna(subset=['SEQ'])` (:443,459). */
  def read(
      spark: SparkSession, path: String,
      cols: Seq[Entry] = defaultColumns): DataFrame = {
    require(cols.exists(_.name == "SEQ"),
      "StpRegistry.read needs SEQ in the column set: the mid-file header " +
        "dropna keys on it (SFMuniDataHelper.py:443,459)")
    val df = FixedWidth.read(spark, path, readerSpecs(cols),
      naValues = Seq("ID"))
    val forced = cols.map { e =>
      if (e.kind == 'I') col(e.name).cast(LongType).as(e.name)
      else col(e.name)
    }
    df.select(forced: _*).where(col("SEQ").isNotNull)
  }

  /** Revenue-service row filters (SFMuniDataHelper.py:488-496): DIR < 2
    * keeps outbound/inbound and drops pull-out/in/mid (codes 6/7/8),
    * QC201 <= 20 is the count-QC default, ROUTE_AVL > 0 drops rows with
    * no identified route. */
  def revenueService(df: DataFrame): DataFrame =
    df.where(col("DIR") < 2 && col("QC201") <= 20 && col("ROUTE_AVL") > 0)
}
