package graft.remote

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.ArrowBridge

/** Client side of the remote SQL surface: dial a [[RemoteServer]], submit
  * one statement, decode the Arrow IPC batch stream into a local DataFrame
  * (the `INCLUDE 'graft://host:port'` federation path rides this, matching
  * the reference's Flight-client INCLUDE,
  * /root/reference/crates/modelardb_server/src/remote.rs:88-165).
  */
object RemoteClient {

  final case class Address(host: String, port: Int)

  /** Parse `graft://host:port`; None for anything else (folder INCLUDEs). */
  def parseAddress(address: String): Option[Address] = {
    val Pattern = "graft://([^:/]+):(\\d+)".r
    address.trim match {
      case Pattern(host, port) => Some(Address(host, port.toInt))
      case _ => scala.None
    }
  }

  /** Run one SQL statement remotely; the result lands as a local
    * DataFrame. The whole batch stream is drained eagerly (the connection
    * is per-statement), so federated results are bounded by what the
    * remote query returns — aggregate remotely, not raw-scan.
    */
  def sql(spark: SparkSession, address: Address, sqlText: String): DataFrame = {
    val socket = new Socket(address.host, address.port)
    try {
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(socket.getOutputStream))
      val in = new DataInputStream(
        new java.io.BufferedInputStream(socket.getInputStream))
      val sqlBytes = sqlText.getBytes(UTF_8)
      out.writeInt(sqlBytes.length); out.write(sqlBytes); out.flush()

      val status = in.readByte()
      if (status != 0) {
        val len = in.readInt()
        val msg = new Array[Byte](len)
        in.readFully(msg)
        throw new IllegalStateException(
          s"Remote query on ${address.host}:${address.port} failed: " +
            new String(msg, UTF_8))
      }
      val batches = Iterator.continually(in.readInt())
        .takeWhile(_ >= 0)
        .map { len =>
          val b = new Array[Byte](len)
          in.readFully(b)
          b
        }.toSeq
      ArrowBridge.fromBatches(spark, batches.iterator)
    } finally socket.close()
  }
}
