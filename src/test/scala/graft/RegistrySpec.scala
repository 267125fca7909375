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
}
