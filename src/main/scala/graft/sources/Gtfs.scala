package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

/** S5 — GTFS feed source (SURVEY.md §2.1). The reference iterates a
  * transitfeed object model (GTFSHelper.py:155-160,324-542); here the zip
  * members are extracted and read as schema'd CSVs, and the object-model
  * walks become relational joins:
  *
  *   trip-stop schedule = stop_times ⋈ trips ⋈ routes
  *
  * GTFS times may exceed 24:00:00 (service-day wraparound, E1) so they are
  * parsed to seconds-since-service-midnight, not timestamps.
  */
object Gtfs {

  val members = Seq("routes.txt", "trips.txt", "stop_times.txt", "calendar.txt")

  /** Extract known members of a GTFS zip into destDir (driver-side: feed
    * zips are small config artifacts; the big data is what they join to).
    */
  def extractZip(zipPath: String, destDir: String): Unit = {
    val dest = new File(destDir)
    dest.mkdirs()
    val zf = new ZipFile(zipPath)
    try {
      val it = zf.entries()
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (members.contains(e.getName)) {
          val out = new FileOutputStream(new File(dest, e.getName))
          try zf.getInputStream(e).transferTo(out)
          finally out.close()
        }
      }
    } finally zf.close()
  }

  /** Read an extracted feed directory into per-member DataFrames. */
  def readFeed(spark: SparkSession, dir: String): Map[String, DataFrame] =
    members.filter(m => new File(dir, m).exists()).map { m =>
      m.stripSuffix(".txt") ->
        spark.read.option("header", "true").csv(s"$dir/$m")
    }.toMap

  /** "HH:MM:SS" (possibly >= 24h) -> seconds since service midnight. */
  def gtfsTimeToSeconds(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = split(c, ":")
    p.getItem(0).cast("int") * 3600 + p.getItem(1).cast("int") * 60 +
      p.getItem(2).cast("int")
  }

  /** Trip-stop schedule with headways (W1): stop_times ⋈ trips ⋈ routes,
    * departure seconds, minutes since the previous trip serving the same
    * (route, direction, stop). */
  def tripStopSchedule(feed: Map[String, DataFrame]): DataFrame = {
    val st = feed("stop_times")
      .withColumn("dep_s", gtfsTimeToSeconds(col("departure_time")))
      .withColumn("seq", col("stop_sequence").cast("int"))
    val trips = feed("trips").select("trip_id", "route_id", "direction_id")
    val routes = feed("routes").select("route_id", "route_short_name")
    val joined = st.join(trips, "trip_id").join(routes, "route_id")
    val w = Window.partitionBy(col("route_id"), col("direction_id"), col("stop_id"))
      .orderBy(col("dep_s"), col("trip_id"))
    joined.withColumn("headway_min",
      (col("dep_s") - lag(col("dep_s"), 1).over(w)) / 60.0)
  }

  /** Build a zip from (memberName -> csv text) — fixture helper. */
  def writeZip(zipPath: String, files: Seq[(String, String)]): Unit = {
    new File(zipPath).getParentFile.mkdirs()
    val out = new ZipOutputStream(new FileOutputStream(zipPath))
    try files.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
