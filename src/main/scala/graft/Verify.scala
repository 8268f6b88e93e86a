package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [qNamePrefix,...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated name-prefix filter for fast local iteration;
    // the driver always runs with 2 args = the full suite
    val keep: String => Boolean =
      if (args.length == 3) { val ps = args(2).split(",").toSeq
        name => ps.exists(name.startsWith)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture parity guard: several oracles assume Spark (UTF-16-unit
    // `length`/`substring`) and DuckDB (codepoint) agree, which holds only
    // while no document carries astral-plane characters (> 0xFFFF: emoji,
    // rare CJK). Today's fixtures satisfy this; if a regeneration ever
    // breaks it, fail LOUDLY here instead of letting q105/q106-style
    // hashes diverge silently mid-round. One cheap aggregate at dump time.
    try {
      import org.apache.spark.sql.functions._
      val astral = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("text").rlike("[\\x{10000}-\\x{10FFFF}]")).count()
      if (astral > 0) {
        System.err.println(s"[verify] FATAL: $astral documents contain " +
          "astral-plane codepoints; UTF-16-unit vs codepoint oracle parity " +
          "(bpeMergeCandidates, TokenSpreadHashes) no longer holds — " +
          "re-pin those oracles before trusting this dump")
        sys.exit(3)
      }
    } catch { case e: Throwable if !e.isInstanceOf[scala.util.control.ControlThrowable] =>
      System.err.println(s"[verify] astral-plane guard skipped: ${e.getMessage}")
    }
    def deleteDir(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.iterator.asScala.toSeq.reverse.foreach(Files.delete)
        finally walk.close()
      }
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      // remove any previous run's output FIRST — a query that now throws
      // must not leave stale parquet behind for the compare to "pass"
      deleteDir(Paths.get(outDir, name))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
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
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Exit EXPLICITLY: every output is flushed by here, and a single
    // non-daemon straggler thread (observed once after a full sf1 sweep:
    // all 135 dumps + the oracle JSON written, JVM alive 30+ minutes
    // past spark.stop()) must not wedge the caller's gate.
    sys.exit(0)
  }
}
