package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.functions._

import graft.tsdb.{Engine, SegmentAggregates, SegmentSchema, TableMetadata}

/** Catalyst-level rewrite of whole-table simple aggregates over a time
  * series view into segment-native aggregates — the Spark counterpart of
  * the reference's `ModelSimpleAggregates` physical optimizer rule
  * (/root/reference/crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-334),
  * applied to the analyzed plan of SQL entering `Engine.sql`.
  *
  * Matches `Aggregate(tag-groupings, [COUNT|MIN|MAX|SUM|AVG(field)...],
  * SubqueryAlias(tst-view))` with no intervening Filter (the reference
  * requires no predicate and no grouping; tags-only grouping is safe for us
  * because tags are denormalized into every segment row). On a match the
  * whole query is answered from segment metadata — reconstruction never
  * runs.
  */
object SegmentAggregateSqlRewrite {

  private[plans] sealed trait AggSpec
  private[plans] final case class FieldAgg(kind: String, field: String, outName: String)
    extends AggSpec
  private[plans] final case class TagRef(tag: String) extends AggSpec

  /** Attempt the rewrite; None leaves the original DataFrame untouched. */
  def tryRewrite(engine: Engine, df: DataFrame): Option[DataFrame] = {
    df.queryExecution.analyzed match {
      case agg: Aggregate => matchAggregate(engine, agg)
        .map { case (meta, groupTags, specs) =>
          build(engine, meta, groupTags, specs)
        }
      case _ => None
    }
  }

  /** Shared matcher: an Aggregate whose child is exactly the registered
    * view, tag-only groupings, and only simple aggregates of stored fields.
    */
  private[plans] def matchAggregate(engine: Engine, agg: Aggregate):
      Option[(TableMetadata, Seq[String], Seq[AggSpec])] = {
    val Aggregate(groupings, results, child, _) = agg
    viewTable(engine, child).flatMap { meta =>
      val tagNames = meta.tagColumns.toSet
      val groupTags = groupings.flatMap {
        case a: AttributeReference if tagNames.contains(a.name) => Some(a.name)
        case _ => None
      }
      if (groupTags.size != groupings.size) None
      else {
        val specs = results.map(spec(meta, groupTags.toSet, _))
        if (specs.exists(_.isEmpty)) None
        else Some((meta, groupTags, specs.flatten))
      }
    }
  }

  /** The child must be exactly the registered logical view of a time series
    * table (a bare SubqueryAlias, optionally over one no-op Project): any
    * Filter or computed projection blocks the rewrite, mirroring the
    * reference's no-predicate requirement. The alias's child plan is
    * compared against the registered view plan — a name match alone could
    * be spoofed by a filtered subquery aliased with the table's name.
    */
  private def viewTable(engine: Engine, child: LogicalPlan): Option[TableMetadata] =
    child match {
      case SubqueryAlias(ident, aliased) =>
        val name = ident.name
        val isRegisteredView = engine.viewPlan(name).exists { vp =>
          aliased.sameResult(vp) || stripAliases(aliased).sameResult(stripAliases(vp))
        }
        if (isRegisteredView) {
          val meta = engine.dataFolder.metadata(name)
          if (meta.isTimeSeries) Some(meta) else None
        } else None
      case Project(exprs, inner) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        viewTable(engine, inner)
      case _ => None
    }

  private def stripAliases(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, inner) => stripAliases(inner)
    case View(_, _, inner, _) => stripAliases(inner)
    case other => other
  }

  private def spec(
      meta: TableMetadata, groupTags: Set[String],
      expr: org.apache.spark.sql.catalyst.expressions.NamedExpression): Option[AggSpec] =
    expr match {
      case a: AttributeReference if groupTags.contains(a.name) => Some(TagRef(a.name))
      case Alias(AggregateExpression(fn, Complete, false, None, _), outName) =>
        fn match {
          case Count(Seq(a: AttributeReference))
              if meta.fieldColumns.contains(a.name) =>
            Some(FieldAgg("count", a.name, outName))
          case Count(Seq(Literal(_, _))) =>
            // count(*) == count(first field) for ANY number of stored
            // fields: every ingest path writes all fields of a row together
            // and rejects NULLs (DataFolder.SegmentIterator.checkNoNulls),
            // and segment copies require matching schemas and move every
            // field's segments under one time filter — so fields are always
            // timestamp-aligned and each field's len equals the row count
            // of the reconstructed view.
            Some(FieldAgg("count", meta.fieldColumns.head, outName))
          case Min(a: AttributeReference) if meta.fieldColumns.contains(a.name) =>
            Some(FieldAgg("min", a.name, outName))
          case Max(a: AttributeReference) if meta.fieldColumns.contains(a.name) =>
            Some(FieldAgg("max", a.name, outName))
          case Sum(a: AttributeReference, _) if meta.fieldColumns.contains(a.name) =>
            Some(FieldAgg("sum", a.name, outName))
          case Average(a: AttributeReference, _) if meta.fieldColumns.contains(a.name) =>
            Some(FieldAgg("avg", a.name, outName))
          case _ => None
        }
      case _ => None
    }

  private[plans] def build(
      engine: Engine, meta: TableMetadata, groupTags: Seq[String],
      specs: Seq[AggSpec]): DataFrame = {
    val segments = engine.dataFolder.segments(meta.name)
    val aggCols = specs.collect { case FieldAgg(kind, field, outName) =>
      SegmentAggregates.aggColumnFor(kind, meta.fieldIndex(field)).as(outName)
    }

    val grouped =
      if (groupTags.isEmpty) segments.agg(aggCols.head, aggCols.tail: _*)
      else segments.groupBy(groupTags.map(col): _*).agg(aggCols.head, aggCols.tail: _*)

    // Preserve the original result column order (tags may interleave).
    val ordered = specs.map {
      case TagRef(tag) => col(tag)
      case FieldAgg(_, _, outName) => col(outName)
    }
    grouped.select(ordered: _*)
  }
}
