package graft

import org.apache.spark.sql.types._

/** Registry-level driver-surface discipline (VERDICT r8 item 3).
  *
  * The driver's oracle harness canonicalizes every query result with
  * pandas `sort_values` + a row hash; a raw ARRAY / MAP / STRUCT column
  * arrives as a numpy array and throws `unhashable type` — exactly how
  * `event_sequences` went red in r8 while returning correct data. The
  * rule pinned here: every `SparkEntry.queries` entry must expose only
  * scalar, sortable, deterministically-serialized columns. Operators
  * keep their typed array outputs for engine callers; serialization
  * (`array_join` / `to_json`) happens at the query surface only.
  *
  * Schema inspection needs analysis, not execution, so this walks all
  * registry entries cheaply at sf0.001. Queries whose builders run
  * eagerly (streaming harnesses) still finish fast at that scale.
  */
class QuerySurfaceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def complexCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every registry query exposes only scalar sortable columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val cols =
          try complexCols(build(spark, sfDir).schema)
          catch { case e: Throwable =>
            Seq(s"BUILD FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        if (cols.isEmpty) Nil else Seq(s"$name -> ${cols.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"\nqueries with canonicalizer-hostile columns:\n  " +
        offenders.mkString("\n  "))
  }
}
