package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registration-time guards over the FULL query registry.
  *
  * The driver's correctness gate hashes result cells through pandas: an
  * array/map/struct output column is unhashable there ("unhashable type:
  * numpy.ndarray") and turns the row into a permanent `err` — the query
  * LOOKS registered but is never actually verified (the r8 sim_jl_project
  * failure shape). Guard the whole registry so the shape can't recur:
  * schemas are available from the lazy plan, so this touches every query's
  * ANALYSIS but executes none of them (fn bodies with eager driver-side
  * stages still run those stages, which is why this spec is the slowest
  * guard — it is still worth it).
  */
class RegistrySpec extends SparkSpec {

  test("every registered query emits only scalar (driver-hashable) columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val complex = fn(spark, sfDir).schema.fields.filter(f =>
          f.dataType match {
            case _: ArrayType | _: MapType | _: StructType => true
            case _ => false
          })
        spark.catalog.clearCache()
        if (complex.isEmpty) None
        else Some(s"$name -> ${complex.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"array/map/struct output columns are unhashable in the driver's comparator:\n  ${offenders.mkString("\n  ")}")
  }

  test("every registered query has an oracle_sql entry (or is knowingly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // queries without SQL-expressible semantics get a weaker rows-only check
    // from the driver; keep that set EXPLICIT so additions are deliberate
    val knownRowsOnly = Set.empty[String]
    assert((missing -- knownRowsOnly).isEmpty,
      s"queries missing an oracle: ${(missing -- knownRowsOnly).toSeq.sorted.mkString(", ")}")
  }
}
