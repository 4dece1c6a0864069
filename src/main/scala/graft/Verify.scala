package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure is LOUD by contract: a query that throws gets a row in
  * `errors.json` (always written, `{}` when clean) and a stderr line, so
  * a broken query can never again appear as silent absence from the
  * correctness report (round-6 lesson: 51 queries vanished traceless).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query ...]")
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
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
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    ran.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: $e")
        errors(name) = Option(e.getMessage).getOrElse(e.toString).take(1000)
      }
      // release per-query persisted intermediates (ScaledWindows pass-1
      // materialization, Materialize caches) so a 244-query battery
      // doesn't accrete executor storage
      finally {
        operators.ScaledWindows.release()
        spark.catalog.clearCache()
      }
    }
    // subset runs must MERGE with prior errors: rewriting errors.json
    // with only the subset's failures would erase the recorded failure
    // of every query outside the subset (silent-absence, again)
    val errPath = Paths.get(s"$outDir/errors.json")
    // prior pairs are kept VERBATIM (already escaped in the file;
    // re-escaping would double-escape). Query names contain no escape
    // characters, so filtering on the raw key is exact.
    val prior: Seq[String] =
      if (only.nonEmpty && Files.exists(errPath)) {
        val re = """"((?:[^"\\]|\\.)+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        re.findAllMatchIn(Files.readString(errPath))
          .filterNot(m => only(m.group(1))) // re-run queries: fresh verdict
          .map(m => s""""${m.group(1)}": "${m.group(2)}"""").toSeq
      } else Seq.empty
    val errJson = (prior ++ errors.map { case (k, v) => s"${q(k)}: ${q(v)}" })
      .mkString("{", ",", "}")
    Files.writeString(errPath, errJson)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size}/${ran.size} queries FAILED: " +
          errors.keys.mkString(", "))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
