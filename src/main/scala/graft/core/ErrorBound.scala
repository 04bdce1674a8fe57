package graft.core

/** Per-column error bound for lossy model-based compression.
  *
  * Semantics follow the reference engine
  * (/root/reference/crates/modelardb_types/src/types.rs:298-335): an absolute
  * bound must be a positive finite value, a relative bound is a percentage in
  * (0, 100], and lossless stores every value exactly (NaN == NaN, each
  * infinity only equal to itself).
  */
sealed trait ErrorBound extends Serializable

object ErrorBound {
  final case class Absolute(bound: Float) extends ErrorBound
  final case class Relative(percentage: Float) extends ErrorBound
  case object Lossless extends ErrorBound

  def absolute(bound: Float): Absolute = {
    require(
      java.lang.Float.isFinite(bound) && bound > 0.0f,
      s"An absolute error bound must be a positive finite value, got $bound.")
    Absolute(bound)
  }

  def relative(percentage: Float): Relative = {
    require(
      percentage > 0.0f && percentage <= 100.0f,
      s"A relative error bound must be in (0, 100], got $percentage.")
    Relative(percentage)
  }

  /** Parse the DDL form: "lossless" | "<abs>" | "<pct>%". */
  def parse(text: String): ErrorBound = {
    val t = text.trim
    if (t.isEmpty || t.equalsIgnoreCase("lossless")) Lossless
    else if (t.endsWith("%")) relative(t.dropRight(1).trim.toFloat)
    else absolute(t.toFloat)
  }

  def render(eb: ErrorBound): String = eb match {
    case Lossless => "lossless"
    case Absolute(b) => b.toString
    case Relative(p) => s"$p%"
  }
}
