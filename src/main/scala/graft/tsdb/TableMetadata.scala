package graft.tsdb

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import graft.core.ErrorBound

/** Column roles of a time series table's logical (query) schema. The
  * reference constrains these to exactly one timestamp column, >= 1 stored
  * field columns (Float32), >= 0 tag columns (strings), and optional
  * generated field columns computed at query time
  * (/root/reference/crates/modelardb_types/src/types.rs:76-239).
  */
final case class ColumnSpec(
    name: String,
    role: String, // "timestamp" | "field" | "tag" | "generated"
    errorBound: String = "lossless", // fields only
    generatedExpr: String = "") // generated only

/** Catalog entry for a table: a normal relational table or a time series
  * table (logical schema + per-field error bounds + generated columns).
  */
final case class TableMetadata(
    name: String,
    tableType: String, // "time_series" | "normal"
    columns: Seq[ColumnSpec],
    normalSchemaJson: String = "") {

  def isTimeSeries: Boolean = tableType == "time_series"

  def timestampColumn: String = columns.find(_.role == "timestamp").map(_.name)
    .getOrElse(throw new IllegalStateException(s"Table $name has no timestamp column."))

  /** Stored field columns in declaration order; position = field_column index. */
  def fieldColumns: Seq[String] = columns.filter(_.role == "field").map(_.name)

  def tagColumns: Seq[String] = columns.filter(_.role == "tag").map(_.name)

  def generatedColumns: Seq[ColumnSpec] = columns.filter(_.role == "generated")

  def errorBoundOf(field: String): ErrorBound =
    ErrorBound.parse(columns.find(c => c.name == field && c.role == "field")
      .getOrElse(throw new IllegalArgumentException(s"$field is not a stored field of $name."))
      .errorBound)

  def fieldIndex(field: String): Int = {
    val i = fieldColumns.indexOf(field)
    require(i >= 0, s"$field is not a stored field of $name.")
    i
  }

  /** Logical (query) schema incl. generated columns, in declaration order. */
  def querySchema: StructType = {
    require(isTimeSeries)
    StructType(columns.map {
      case ColumnSpec(n, "timestamp", _, _) => StructField(n, TimestampType, nullable = false)
      case ColumnSpec(n, "field", _, _) => StructField(n, FloatType, nullable = false)
      case ColumnSpec(n, "generated", _, _) => StructField(n, FloatType, nullable = true)
      case ColumnSpec(n, "tag", _, _) => StructField(n, StringType, nullable = false)
      case c => throw new IllegalStateException(s"Unknown role ${c.role}")
    })
  }

  def validate(): this.type = {
    if (isTimeSeries) {
      require(columns.count(_.role == "timestamp") == 1,
        s"Table $name must have exactly one timestamp column.")
      require(fieldColumns.nonEmpty, s"Table $name must have at least one stored field.")
      require(fieldColumns.size <= 32767, "At most 32767 field columns are supported.")
      columns.filter(_.role == "field").foreach(c => ErrorBound.parse(c.errorBound))

      // Generated columns are checked at CREATE time, as in the reference
      // (parser-time semantic checks; generated columns must not reference
      // other generated columns, types.rs:130-140).
      val generatedNames = columns.filter(_.role == "generated").map(_.name).toSet
      val knownNames = columns.map(_.name).toSet
      columns.filter(_.role == "generated").foreach { c =>
        require(c.generatedExpr.nonEmpty,
          s"Generated column ${c.name} needs an expression.")
        val parsed =
          try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(c.generatedExpr)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"Generated column ${c.name}: cannot parse '${c.generatedExpr}': " +
              e.getMessage)
          }
        parsed.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }.foreach { ref =>
          require(!generatedNames.contains(ref),
            s"Generated column ${c.name} cannot reference generated column " +
              s"$ref.")
          require(knownNames.contains(ref),
            s"Generated column ${c.name} references unknown column $ref.")
        }
      }
    }
    this
  }
}

object TableMetadata {
  private val mapper = new ObjectMapper()

  def toJson(m: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("name", m.name)
    root.put("tableType", m.tableType)
    if (m.normalSchemaJson.nonEmpty) root.put("normalSchemaJson", m.normalSchemaJson)
    val cols = root.putArray("columns")
    m.columns.foreach { c =>
      val o = cols.addObject()
      o.put("name", c.name)
      o.put("role", c.role)
      if (c.role == "field") o.put("errorBound", c.errorBound)
      if (c.role == "generated") o.put("generatedExpr", c.generatedExpr)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): TableMetadata = {
    val root = mapper.readTree(json)
    val cols = root.get("columns")
    val specs = (0 until cols.size()).map { i =>
      val o = cols.get(i)
      ColumnSpec(
        o.get("name").asText(),
        o.get("role").asText(),
        if (o.has("errorBound")) o.get("errorBound").asText() else "lossless",
        if (o.has("generatedExpr")) o.get("generatedExpr").asText() else "")
    }
    TableMetadata(
      root.get("name").asText(),
      root.get("tableType").asText(),
      specs,
      if (root.has("normalSchemaJson")) root.get("normalSchemaJson").asText() else "")
      .validate()
  }
}
