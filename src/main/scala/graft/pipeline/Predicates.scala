package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The pipeline edge-predicate language (operator P1) compiled to
  * Catalyst `Column` expressions.
  *
  * Semantics mirror packages/shared/pipeline/predicates.py:90-258:
  *   - exact string match; glob when the pattern contains `*?[`
  *   - negation prefix `!` (checked AFTER numeric so `!=` stays numeric)
  *   - numeric comparison `>= <= > < == !=` against float(value)
  *   - array pattern = OR of element patterns
  *   - boolean patterns match booleans and "true"/"1"/"yes" strings
  *   - dot-paths into nested structs; legacy `source_metadata.` prefix
  *     translates to `metadata.source.`
  *   - null/missing value never matches (except catch-all)
  *   - multiple fields AND'd; empty/None predicate = catch-all true
  *
  * Compiling to `Column` (vs a row-level closure) keeps routing inside
  * whole-stage codegen and lets Catalyst push the predicate into the
  * scan when it only references scan columns.
  */
object Predicates {

  sealed trait Pattern
  case object PAny extends Pattern
  final case class PExact(s: String) extends Pattern
  final case class PGlob(glob: String) extends Pattern
  final case class PNeg(inner: Pattern) extends Pattern
  final case class PNumCmp(op: String, threshold: Double) extends Pattern
  final case class POr(alts: Seq[Pattern]) extends Pattern
  final case class PBool(b: Boolean) extends Pattern
  final case class PNumExact(d: Double) extends Pattern

  private val NumericPattern = "^(>=|<=|>|<|==|!=)\\s*(-?\\d+(?:\\.\\d+)?)$".r

  /** Parse one pattern value (String / Boolean / Number / Seq / null). */
  def parsePattern(v: Any): Pattern = v match {
    case null => PAny
    case s: String =>
      NumericPattern.findFirstMatchIn(s) match {
        case Some(m) => PNumCmp(m.group(1), m.group(2).toDouble)
        case None =>
          if (s.startsWith("!")) PNeg(parsePattern(s.substring(1)))
          else if (s.exists(c => c == '*' || c == '?' || c == '[')) PGlob(s)
          else PExact(s)
      }
    case b: Boolean => PBool(b)
    case xs: Seq[_] => POr(xs.map(parsePattern))
    case n: Int => PNumExact(n.toDouble)
    case n: Long => PNumExact(n.toDouble)
    case n: Double => PNumExact(n)
    case n: Float => PNumExact(n.toDouble)
    case other => PExact(other.toString)
  }

  /** fnmatch glob → anchored Java regex (POSIX fnmatch is
    * case-sensitive; `[!...]` negates a class). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else {
            var cls = glob.substring(i + 1, close)
            if (cls.startsWith("!")) cls = "^" + cls.substring(1)
            sb.append('[').append(cls.replace("\\", "\\\\")).append(']')
            i = close
          }
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Compile one pattern against a value column. */
  def compilePattern(p: Pattern, value: Column): Column = p match {
    case PAny => lit(true)
    case PExact(s) =>
      // non-string values compare via their string form (str(value) == pattern)
      value.cast("string") === lit(s)
    case PGlob(g) => value.cast("string").rlike("^" + globToRegex(g) + "$")
    case PNeg(inner) =>
      // reference: `not match_value(...)`, but a null value still fails
      // the outer match (None short-circuits before pattern dispatch)
      !compilePattern(inner, value)
    case PNumCmp(op, t) =>
      val v = value.cast("double")
      op match {
        case ">"  => v > t
        case ">=" => v >= t
        case "<"  => v < t
        case "<=" => v <= t
        case "==" => v === t
        case "!=" => v =!= t
      }
    case POr(alts) => alts.map(compilePattern(_, value)).reduce(_ || _)
    case PBool(b) =>
      val asBool = when(value.cast("string").isin("true", "1", "yes"), lit(true))
        .when(value.cast("string").isin("false", "0", "no"), lit(false))
        .otherwise(value.cast("boolean"))
      if (b) asBool === true else asBool === false
    case PNumExact(d) => value.cast("double") === lit(d)
  }

  /** Legacy path translation (predicates.py:36-60). */
  def translatePath(path: String): String =
    if (path.startsWith("source_metadata."))
      "metadata.source." + path.stripPrefix("source_metadata.")
    else if (path == "source_metadata") "metadata.source"
    else path

  /** Compile a whole predicate map to one boolean Column. Missing/null
    * fields never match non-catch-all patterns. */
  def compile(predicate: Map[String, Any]): Column =
    if (predicate == null || predicate.isEmpty) lit(true)
    else predicate.toSeq.sortBy(_._1).map { case (field, pat) =>
      val value = col(translatePath(field))
      parsePattern(pat) match {
        case PAny => lit(true)
        case p => value.isNotNull && compilePattern(p, value)
      }
    }.reduce(_ && _)

  /** First-match-wins routing (shared/pipeline/router.py:94-292):
    * chained when/otherwise producing the matched route's name, null if
    * nothing matches (callers append a catch-all). */
  def firstMatchRoute(routes: Seq[(String, Map[String, Any])]): Column =
    routes.foldRight(lit(null).cast("string")) { case ((name, pred), rest) =>
      when(compile(pred), lit(name)).otherwise(rest)
    }

  /** Parallel fan-out routing: array of ALL matching route names —
    * explode to duplicate a row down several paths with path_id tags. */
  def allMatchesRoute(routes: Seq[(String, Map[String, Any])]): Column =
    filter(
      array(routes.map { case (name, pred) =>
        when(compile(pred), lit(name)).otherwise(lit(null).cast("string"))
      }: _*),
      _.isNotNull)
}
