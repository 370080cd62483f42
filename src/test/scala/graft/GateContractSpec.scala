package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static invariants of the driver gate inventory — breakages here are
  * contract bugs the downstream tooling would otherwise surface as
  * confusing driver-side failures.
  */
class GateContractSpec extends AnyFunSuite {

  test("gate names are unique and well-formed") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, v) if v.size > 1 => n }.mkString(","))
    assert(names.forall(_.matches("[a-z][a-z0-9_]+")), names.filterNot(_.matches("[a-z][a-z0-9_]+")))
  }

  test("every no-oracle entry declares an existing, oracle-checked parity sibling") {
    val byName = SparkEntry.defs.map(d => d.name -> d).toMap
    val noOracle = SparkEntry.defs.filter(_.oracle.isEmpty).map(_.name).toSet
    // (a) every no-oracle row has at least one sibling declared
    val undeclared = noOracle -- SparkEntry.paritySiblings.keySet
    assert(undeclared.isEmpty,
      s"no-oracle gate entries without a parity sibling: ${undeclared.mkString(", ")} — " +
        "declare the hash-green twin in SparkEntry.paritySiblings")
    // (b) the map has no stale keys (entries that are not no-oracle rows)
    val stale = SparkEntry.paritySiblings.keySet -- noOracle
    assert(stale.isEmpty, s"paritySiblings keys that are not no-oracle rows: ${stale.mkString(", ")}")
    // (c) every declared sibling exists and IS oracle-checked itself
    for ((row, sibs) <- SparkEntry.paritySiblings; s <- sibs) {
      assert(byName.contains(s), s"$row: sibling $s is not a gate entry")
      assert(byName(s).oracle.isDefined, s"$row: sibling $s has no oracle — a " +
        "rows-only sibling cannot vouch for a rows-only row")
    }
  }
}
