package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: the registry is the single source of truth. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle belongs to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracles follow the determinism discipline: total ORDER BY present") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("entry (flagship) smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(SharedSpark.spark).count() > 0)
  }

  test("every registry query's output schema is scalar-only " +
    "(the driver's pandas checker sorts all outputs and crashes on " +
    "nested/binary columns — even no-oracle ones)") {
    import org.apache.spark.sql.types._
    def flat(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => false
      case _ => true
    }
    val offenders = SparkEntry.registry.flatMap { q =>
      val schema = q.run(SharedSpark.spark, SharedSpark.sf001).schema
      schema.fields.filterNot(f => flat(f.dataType))
        .map(f => s"${q.name}.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"non-scalar driver-visible columns:\n${offenders.mkString("\n")}")
  }
}
