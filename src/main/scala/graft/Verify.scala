package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing args: run only the named queries (local iteration);
    // the driver passes exactly (sfDir, outDir) and gets the full set
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same scheduler shape as Bench: rebuilds yield to foreground jobs
      .config("spark.scheduler.mode", "FAIR")
      // 54 sequential queries build catalog fixtures that localCheckpoint;
      // without periodic driver GC their dead blocks accumulate across the
      // whole run (see Bench/SCALE.md "long-lived driver hygiene")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failing query must be VISIBLE in the driver's correctness JSON, not
    // silently absent (r5 lost two red queries that way): every failure is
    // recorded in errors.json AND as a one-row `_error`-schema parquet in
    // the query's slot, so even a driver that only diffs parquet against
    // the oracle reports an unmistakable schema/row mismatch for it.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.toString).getOrElse("unknown").take(500)
        try {
          import spark.implicits._
          Seq(failures(name)).toDF("_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case w: Throwable =>
          System.err.println(s"[verify] $name marker write failed: $w")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // always written (empty object when green) so the driver — and the
    // judge — can distinguish "no failures" from "failures swallowed"
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
