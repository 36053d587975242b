package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — network/edge-list reader for Dynameq-style sectioned text exports
  * (HwyNetwork.py:202-224 delegates to the dta package's
  * DynameqNetwork.read over `{prefix}_*.dqt` files). The format family:
  * `<TAG>` preamble lines, then ALL-CAPS section keywords (NODES, LINKS,
  * ...), each followed by a `*`-prefixed header line naming the columns,
  * then whitespace-delimited rows until the next section.
  *
  * Network files are config artifacts (like the GTFS zip): parsed on the
  * driver, materialized as broadcast-sized DataFrames, and joined/probed
  * from there — the data-scale side is whatever facts reference the
  * links. All columns come out as strings; callers cast.
  */
object NetworkFile {

  def readSections(
      spark: SparkSession, path: String): Map[String, DataFrame] = {
    val src = scala.io.Source.fromFile(path)
    val lines = try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally src.close()
    val out = scala.collection.mutable.Map[String, (Seq[String], Vector[Seq[String]])]()
    var section: Option[String] = None
    lines.foreach {
      case l if l.startsWith("<") => // preamble/version tags
      case l if l.matches("[A-Z_]+") =>
        section = Some(l)
        out(l) = (Seq.empty, Vector.empty)
      case l if l.startsWith("*") =>
        section.foreach { s =>
          out(s) = (l.drop(1).trim.split("\\s+").toSeq, out(s)._2)
        }
      case l =>
        section.foreach { s =>
          out(s) = (out(s)._1, out(s)._2 :+ l.split("\\s+").toSeq)
        }
    }
    out.map { case (name, (header, rows)) =>
      val cols = if (header.nonEmpty) header
        else (1 to rows.headOption.map(_.size).getOrElse(0)).map(i => s"c$i")
      val padded = rows.map(r => org.apache.spark.sql.Row.fromSeq(
        r.padTo(cols.size, null).take(cols.size)))
      val schema = org.apache.spark.sql.types.StructType(
        cols.map(c => org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.StringType)))
      name -> spark.createDataFrame(
        spark.sparkContext.parallelize(padded.toSeq, 1), schema)
    }.toMap
  }

  /** Assemble road links: LINKS joined to NODES for endpoint coordinates,
    * free-flow seconds derived from length (miles) over fspeed (mph) —
    * the dta package's initializeEdgeCostsWithFFTT step. */
  def roadLinks(sections: Map[String, DataFrame]): DataFrame = {
    val nodes = sections("NODES").select(col("id").as("nid"),
      col("x").cast("double"), col("y").cast("double"))
    val links = sections("LINKS").select(
      col("id").cast("long").as("link_id"),
      col("start"), col("end"),
      col("length").cast("double").as("length_mi"),
      col("fspeed").cast("double").as("fspeed_mph"))
    links
      .join(broadcast(nodes.select(col("nid"), col("x").as("ax"), col("y").as("ay"))),
        col("start") === col("nid")).drop("nid")
      .join(broadcast(nodes.select(col("nid"), col("x").as("bx"), col("y").as("by"))),
        col("end") === col("nid")).drop("nid")
      .withColumn("ff_sec",
        when(col("fspeed_mph") > 0, col("length_mi") / col("fspeed_mph") * 3600.0))
      .select("link_id", "ax", "ay", "bx", "by", "length_mi", "ff_sec")
  }

  /** MOVEMENTS section → (in_link_id, out_link_id) pairs: each movement
    * row is a node triple `at start end` describing the turn from the
    * approach link (start→at) onto the departure link (at→end) — the
    * Dynameq movement table the reference's skim iterates
    * (HwyNetwork.py:257-276). A movement ABSENT from the section is a
    * turn restriction: no edge in the link graph. */
  def movementLinkPairs(sections: Map[String, DataFrame]): DataFrame = {
    val links = sections("LINKS").select(
      col("id").cast("long").as("link_id"), col("start"), col("end"))
    val mv = sections("MOVEMENTS")
      .select(col("at"), col("start").as("m_start"), col("end").as("m_end"))
    mv.join(broadcast(links.select(col("link_id").as("in_link_id"),
        col("start").as("in_s"), col("end").as("in_e"))),
        col("m_start") === col("in_s") && col("at") === col("in_e"))
      .join(broadcast(links.select(col("link_id").as("out_link_id"),
        col("start").as("out_s"), col("end").as("out_e"))),
        col("at") === col("out_s") && col("m_end") === col("out_e"))
      .select("in_link_id", "out_link_id")
  }
}
