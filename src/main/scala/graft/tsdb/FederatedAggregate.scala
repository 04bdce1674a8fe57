package graft.tsdb

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, Max, Min, StddevPop, StddevSamp, Sum,
  VariancePop, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Federated aggregate pushdown for `INCLUDE MERGE 'endpoint' SELECT …`.
  *
  * The plain `INCLUDE` fans the statement out verbatim and row-unions the
  * results — the reference's federation contract
  * (/root/reference/crates/modelardb_server/src/remote.rs:88-165). For an
  * aggregate SELECT that contract returns one result row per endpoint; to
  * aggregate over the COMBINED data a user would otherwise have to pull
  * raw points and re-aggregate locally. `INCLUDE MERGE` instead decomposes
  * the aggregate into algebraic partials, ships the PARTIAL query to every
  * endpoint, and merges the partial frames locally — the same
  * partial/merge split Spark itself applies between executors, lifted to
  * the federation layer. Each endpoint answers its partial query through
  * its own engine, so the segment-native aggregate rewrite applies
  * per-node: a federated `avg(value)` is answered from segment metadata on
  * every endpoint, and only `groups × partials` scalars cross the wire.
  *
  * Supported: `count` / `sum` / `min` / `max` / `avg` and the variance
  * family (`var_pop/var_samp/stddev_pop/stddev_samp`, merged through
  * [[PartialM2Merge]]'s Chan update — no catastrophic Σv² cancellation),
  * under arbitrary scalar post-processing and grouping expressions.
  * Rejected (with a clear error): DISTINCT aggregates, FILTER clauses,
  * HAVING / ORDER BY / LIMIT on the merged statement, ordinal GROUP BY,
  * and non-decomposable functions — those semantics need the raw rows, so
  * the caller should fall back to plain INCLUDE over a point query.
  */
object FederatedAggregate {

  /** `partialSql` runs on every endpoint (including the local engine);
    * `merge` folds the resulting partial frames into the final answer.
    */
  final case class Decomposed(
      partialSql: String, merge: Seq[DataFrame] => DataFrame)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"INCLUDE MERGE: $msg")

  /** Analyze `selectText` against the CURRENT session catalog (the caller
    * must have registered the engine views) and decompose it.
    */
  def decompose(spark: SparkSession, selectText: String): Decomposed = {
    val analyzed = spark.sql(selectText).queryExecution.analyzed
    val agg = analyzed match {
      case a: Aggregate => a
      case other => fail(
        "the statement must be a plain aggregate SELECT (no HAVING, " +
          s"ORDER BY, LIMIT or set operation); got ${other.nodeName}. " +
          "Use plain INCLUDE for row-union federation.")
    }
    val (head, fromTail) = splitAtTopLevelFrom(selectText)
    if (head.isEmpty || fromTail.isEmpty)
      fail("could not locate the statement's top-level FROM clause.")
    rejectOrdinalGroupBy(fromTail)

    val groupings = agg.groupingExpressions.zipWithIndex

    // Partial select items, deduplicated by text: __g<i> carries each
    // grouping expression, __p<j> each partial aggregate.
    val partials = mutable.LinkedHashMap.empty[String, String]
    def pAlias(text: String): String =
      partials.getOrElseUpdate(text, s"__p${partials.size}")

    def sqlOf(e: Expression): String =
      try e.sql catch {
        case scala.util.control.NonFatal(_) =>
          fail(s"cannot render $e back to SQL for the partial query.")
      }

    def m2MergeCol(cnt: Column, sm: Column, m2: Column): Column =
      ColumnBridge.column(PartialM2Merge(
        ColumnBridge.expression(cnt), ColumnBridge.expression(sm),
        ColumnBridge.expression(m2)).toAggregateExpression())

    /** Register the variance partials (n, Σv, per-endpoint M2 — the
      * endpoint computes `var_pop(x)·count(x)`, exactly its group's
      * centered second moment) and return the merged statistic.
      */
    def varianceMerge(child: Expression, pop: Boolean, sq: Boolean): Column = {
      val x = sqlOf(child)
      val pn = pAlias(s"count($x)")
      val ps = pAlias(s"sum(CAST($x AS DOUBLE))")
      val pm = pAlias(s"(var_pop($x) * count($x))")
      val n = sum(col(pn))
      val m2 = m2MergeCol(col(pn), col(ps), col(pm))
      // Spark's CentralMomentAgg contract: NULL on 0 rows, and for the
      // sample statistics NaN on a single row.
      val v =
        if (pop) when(n > 0L, m2 / n.cast("double"))
        else when(n === 0L, lit(null).cast("double"))
          .when(n === 1L, lit(Double.NaN))
          .otherwise(m2 / (n - 1L).cast("double"))
      if (sq) sqrt(v) else v
    }

    /** The merged column for one aggregate call, registering whatever
      * partials it needs.
      */
    def mergeColOf(ae: AggregateExpression): Column = {
      if (ae.isDistinct) fail(
        s"DISTINCT aggregate ${ae.sql} is not algebraically mergeable.")
      if (ae.filter.isDefined) fail(
        s"FILTER clause on ${ae.sql} is not supported; filter in WHERE.")
      ae.aggregateFunction match {
        case c: Count =>
          val p = pAlias(s"count(${c.children.map(sqlOf).mkString(", ")})")
          coalesce(sum(col(p)), lit(0L))
        case s: Sum => sum(col(pAlias(s"sum(${sqlOf(s.child)})")))
        case m: Min => min(col(pAlias(s"min(${sqlOf(m.child)})")))
        case m: Max => max(col(pAlias(s"max(${sqlOf(m.child)})")))
        case a: Average =>
          val x = sqlOf(a.child)
          sum(col(pAlias(s"sum($x)"))) /
            sum(col(pAlias(s"count($x)"))).cast("double")
        case v: VariancePop => varianceMerge(v.child, pop = true, sq = false)
        case v: VarianceSamp => varianceMerge(v.child, pop = false, sq = false)
        case v: StddevPop => varianceMerge(v.child, pop = true, sq = true)
        case v: StddevSamp => varianceMerge(v.child, pop = false, sq = true)
        case other => fail(
          s"aggregate ${other.prettyName} is not algebraically mergeable " +
            "(supported: count, sum, min, max, avg, var_pop, var_samp, " +
            "stddev_pop, stddev_samp).")
      }
    }

    // Distinct aggregate calls across the select list, keyed semantically
    // so `avg(v)` appearing twice merges once.
    val mergedAggs = mutable.ArrayBuffer.empty[(AggregateExpression, String, Column)]
    def mergedAliasFor(ae: AggregateExpression): String =
      mergedAggs.find(_._1.semanticEquals(ae)) match {
        case Some((_, a, _)) => a
        case scala.None =>
          val alias = s"__a${mergedAggs.size}"
          mergedAggs += ((ae, alias, mergeColOf(ae)))
          alias
      }

    // Rewrite each output expression over the merged frame: grouping
    // subtrees become __g<i> references, aggregate calls become their
    // merged alias, scalar post-processing (round, arithmetic, casts)
    // survives untouched.
    def rewrite(e: Expression): Expression =
      groupings.find { case (g, _) => g.semanticEquals(e) } match {
        case Some((_, i)) => UnresolvedAttribute(s"__g$i")
        case scala.None => e match {
          case ae: AggregateExpression => UnresolvedAttribute(mergedAliasFor(ae))
          case _ => e.mapChildren(rewrite)
        }
      }
    val finalCols: Seq[Column] = agg.aggregateExpressions.map { ne =>
      val body = ne match { case Alias(c, _) => c; case e => e }
      ColumnBridge.column(rewrite(body)).as(ne.name)
    }

    val items =
      groupings.map { case (g, i) => s"${sqlOf(g)} AS __g$i" } ++
        partials.map { case (text, alias) => s"$text AS $alias" }
    if (items.isEmpty) fail("nothing to compute.")
    val partialSql = s"SELECT ${items.mkString(", ")} $fromTail"

    val gCols = groupings.map { case (_, i) => col(s"__g$i") }
    val merge = (frames: Seq[DataFrame]) => {
      require(frames.nonEmpty)
      val all = frames.reduce(_ unionByName _)
      val merged =
        if (mergedAggs.isEmpty) all.select(gCols: _*).distinct()
        else {
          val aggCols = mergedAggs.map { case (_, a, c) => c.as(a) }.toSeq
          if (gCols.isEmpty) all.agg(aggCols.head, aggCols.tail: _*)
          else all.groupBy(gCols: _*).agg(aggCols.head, aggCols.tail: _*)
        }
      merged.select(finalCols: _*)
    }
    Decomposed(partialSql, merge)
  }

  /** Split at the SELECT's own FROM: the first `FROM` keyword at paren
    * depth 0 outside quotes/backticks (`extract(x FROM ts)` and subquery
    * FROMs sit inside parens).
    */
  private[graft] def splitAtTopLevelFrom(sql: String): (String, String) = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'f' | 'F' if depth == 0 &&
            sql.regionMatches(true, i, "FROM", 0, 4) &&
            (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
            (i + 4 >= sql.length || !isWordChar(sql.charAt(i + 4))) =>
          return (sql.substring(0, i).trim, sql.substring(i).trim)
        case _ =>
      }
      i += 1
    }
    (sql.trim, "")
  }

  /** The partial query replaces the select list, so ordinal GROUP BY
    * references (`GROUP BY 1`) would silently re-bind — reject them.
    */
  private def rejectOrdinalGroupBy(fromTail: String): Unit = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < fromTail.length) {
      val c = fromTail.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'g' | 'G' if depth == 0 &&
            fromTail.regionMatches(true, i, "GROUP", 0, 5) &&
            (i == 0 || !isWordChar(fromTail.charAt(i - 1))) =>
          val rest = fromTail.substring(i)
          val afterBy = rest.replaceFirst("(?is)^GROUP\\s+BY\\s*", "")
          if (afterBy.length < rest.length) {
            // Top-level comma split of the grouping list (it runs to the
            // statement end: HAVING/ORDER/LIMIT were rejected upstream).
            var d2 = 0; var q2: Char = 0; var start = 0; var j = 0
            val toks = mutable.ArrayBuffer.empty[String]
            while (j < afterBy.length) {
              val c2 = afterBy.charAt(j)
              if (q2 != 0) { if (c2 == q2) q2 = 0 }
              else c2 match {
                case '\'' | '"' | '`' => q2 = c2
                case '(' => d2 += 1
                case ')' => d2 -= 1
                case ',' if d2 == 0 =>
                  toks += afterBy.substring(start, j); start = j + 1
                case _ =>
              }
              j += 1
            }
            toks += afterBy.substring(start)
            if (toks.exists(_.trim.matches("\\d+"))) fail(
              "ordinal GROUP BY references re-bind when the select list " +
                "is rewritten to partials; use explicit expressions.")
          }
        case _ =>
      }
      i += 1
    }
  }
}
