package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — fixed-width file source (SURVEY.md §2.1).
  *
  * The reference reads 90-column fixed-width AVL/APC files with pandas
  * `read_fwf` in 100k-row chunks (sfdata_wrangler/SFMuniDataHelper.py:422-430,
  * colspecs :71-170). Spark-first: `spark.read.text` + substring projections
  * from a colspec table — fully parallel (text splits by HDFS block), no
  * chunk loop, and the projection is codegen'd. Mid-file header rows are
  * killed by na-value nulling + dropna on a key column, exactly like the
  * reference's `na_values=['ID']` + `dropna(subset=['SEQ'])` (:443).
  */
object FixedWidth {

  /** One column: 1-based start position, length, target type. */
  final case class ColSpec(name: String, start: Int, len: Int, typ: DataType)

  def read(
      spark: SparkSession, path: String, specs: Seq[ColSpec],
      naValues: Seq[String] = Seq.empty): DataFrame = {
    val raw = spark.read.text(path)
    val cols = specs.map { c =>
      val s = trim(substring(col("value"), c.start, c.len))
      val cleaned =
        if (naValues.isEmpty) s
        else when(s.isin(naValues.map(lit): _*), lit(null)).otherwise(s)
      val empty = when(length(cleaned) === 0, lit(null)).otherwise(cleaned)
      // try_cast: unparseable fields (mid-file header text, na remnants)
      // must become null, not ANSI cast errors — that null-ness is what
      // the downstream dropna key filter keys on (F1)
      empty.try_cast(c.typ).as(c.name)
    }
    raw.select(cols: _*)
  }

  /** Fixed-width writer (for fixtures / round-tripping): left-justified
    * string fields, right-justified numerics, single text column.
    * Fields land at their declared ABSOLUTE start positions: when a
    * spec's start is past the previous field's end (the STP registry
    * leaves 1-byte separator gaps between most windows), the gap is
    * emitted as spaces so reader positions stay aligned. */
  def formatLine(specs: Seq[ColSpec]): org.apache.spark.sql.Column = {
    var pos = 1
    val parts = specs.map { c =>
      require(c.start >= pos,
        s"overlapping colspec windows at ${c.name}: start ${c.start} < $pos")
      val gap = c.start - pos
      pos = c.start + c.len
      val v = coalesce(col(c.name).cast("string"), lit(""))
      val padded = c.typ match {
        case StringType => rpad(v, c.len, " ")
        case _          => lpad(v, c.len, " ")
      }
      // lpad/rpad silently TRUNCATE overlong values — that would corrupt
      // data on the round-trip; fail loudly at the write site instead
      val guarded = when(length(v) > c.len,
        raise_error(concat(lit(s"fixed-width overflow in ${c.name} (${c.len}): "), v)))
        .otherwise(padded)
      if (gap > 0) concat(lit(" " * gap), guarded) else guarded
    }
    concat(parts: _*)
  }
}
