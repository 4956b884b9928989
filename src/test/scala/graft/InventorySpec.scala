package graft

/** Whole-inventory contract checks: every registered query runs at
  * sf0.001 and returns rows; names/oracles stay consistent. This is the
  * in-repo twin of the driver's t1 smoke.
  */
class InventorySpec extends SparkSpec {

  test("inventory names are unique") {
    val names = SparkEntry.inventory.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sfDir).count()
        if (n == 0) Some(name) else None
    }
    // Near-dup/LSH queries may legitimately return 0 pairs at tiny scale,
    // and at sf0.001 every customer has an order (empty anti-join);
    // q7_nation_volume needs a cross-nation supplier/customer pair inside
    // its two-year ship-date band — none survives at sf0.001 (verified:
    // the oracle is empty there too; both engines agree at sf0.01);
    // everything else must produce rows.
    val allowedEmpty = Set("dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "dedup_components", "dedup_embedding_cosine",
      "text_levenshtein", "q_anti_join", "q7_nation_volume")
    assert(empties.toSet.subsetOf(allowedEmpty),
      s"unexpectedly empty results: ${empties.filterNot(allowedEmpty)}")
  }
}
