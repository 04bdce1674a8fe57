package graft.remote

import java.io.PrintStream

import org.apache.spark.sql.SparkSession

/** Interactive SQL client for a graft:// server — the operator-convenience
  * counterpart of the reference's CLI client
  * (/root/reference/crates/modelardb_client/src/main.rs): statements are
  * read (multi-line, `;`-terminated), executed remotely, and the Arrow
  * IPC results rendered as tables. One-shot mode (`-c "sql"`) for
  * scripting.
  *
  * {{{
  *   sbt 'runMain graft.remote.ClientMain graft://localhost:9901'
  *   sbt 'runMain graft.remote.ClientMain graft://localhost:9901 -c "SELECT 1"'
  * }}}
  *
  * Meta-commands: `\dt` lists the server's tables (normal + time series),
  * `\q` quits.
  */
object ClientMain {

  private val TablesSql =
    "SELECT table_name, 'normal' AS table_type " +
      "FROM metadata_normal_table_metadata " +
      "UNION ALL SELECT table_name, 'time series' AS table_type " +
      "FROM metadata_time_series_table_metadata ORDER BY table_name"

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ClientMain graft://host:port [-c \"sql statement\"]")
    val address = RemoteClient.parseAddress(args(0)).getOrElse(
      throw new IllegalArgumentException(
        s"not a graft://host:port address: ${args(0)}"))
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.length >= 3 && args(1) == "-c") {
      runStatements(spark, address, Iterator(args(2) + ";"), System.out)
    } else {
      println(s"connected to ${args(0)} — ';' runs, \\dt lists tables, \\q quits")
      runStatements(spark, address,
        Iterator.continually(scala.io.StdIn.readLine("graft> "))
          .takeWhile(_ != null),
        System.out)
    }
    spark.stop()
  }

  /** The statement loop, factored for tests: consume input lines,
    * accumulate until `;` (or handle a `\`-meta line), execute remotely,
    * render. Errors print and the loop continues — a typo must not kill
    * the session.
    */
  private[remote] def runStatements(
      spark: SparkSession, address: RemoteClient.Address,
      lines: Iterator[String], out: PrintStream): Unit = {
    val pending = new StringBuilder
    var open = true
    while (open && lines.hasNext) {
      val line = lines.next()
      val trimmed = line.trim
      if (pending.isEmpty && trimmed.startsWith("\\")) {
        trimmed match {
          case "\\q" => open = false
          case "\\dt" => execute(spark, address, TablesSql, out)
          case other => out.println(s"unknown command $other (try \\dt or \\q)")
        }
      } else {
        pending.append(line).append('\n')
        if (trimmed.endsWith(";")) {
          val sql = pending.toString().trim.stripSuffix(";").trim
          pending.clear()
          if (sql.nonEmpty) execute(spark, address, sql, out)
        }
      }
    }
  }

  private def execute(spark: SparkSession, address: RemoteClient.Address,
      sql: String, out: PrintStream): Unit =
    try {
      val df = RemoteClient.sql(spark, address, sql)
      // show() prints through Console.out; redirecting keeps the loop
      // testable and lets -c mode compose in pipelines.
      Console.withOut(out)(df.show(1000, truncate = false))
    } catch {
      case scala.util.control.NonFatal(e) =>
        out.println(s"error: ${e.getMessage}")
    }
}
