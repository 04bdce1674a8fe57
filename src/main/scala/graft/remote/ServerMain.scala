package graft.remote

import org.apache.spark.sql.SparkSession

import graft.tsdb.Engine

/** Standalone remote endpoint: serve a data folder's SQL surface over the
  * graft:// protocol until killed.
  *
  * {{{ sbt 'runMain graft.remote.ServerMain /path/to/folder 9901' }}}
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServerMain <dataFolderRoot> [port]")
    val root = args(0)
    val port = if (args.length > 1) args(1).toInt else 9901
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new RemoteServer(new Engine(spark, root), port)
    println(s"graft remote server listening on ${server.address}")
    Thread.currentThread().join() // serve until killed
  }
}
