package graft

/** Every registered query runs on sf0.001 and returns a sane result.
  * (Bitwise oracle equality is the driver's t2 gate + scripts/check_oracle.py;
  * this suite guards against runtime regressions.)
  */
class QueriesSmokeSpec extends SparkSpec {

  Queries.all.foreach { case (name, q) =>
    test(s"query '$name' runs on sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      // every oracle-matched query must produce rows on real data, except
      // predicates that can legitimately select none at tiny scale
      if (q.sql.isDefined && !Set("embedding_neardup", "simhash_neardup").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql declared only for registered queries, with coverage >= 85%") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    // `_prod` keys are the engine-internal-hash (xxhash64) twins of a
    // hash-green md5 sibling — structurally un-oracle-able (DuckDB has no
    // xxhash64) and each pinned instead by an equivalence spec against
    // its sibling. They are excluded from the ratio; every OTHER rows-only
    // key (sketches, sampling, trained ANN, csv) still counts against it.
    val prodTwins = qs.filter(_.endsWith("_prod"))
    prodTwins.foreach { name =>
      assert(qs.contains(name.stripSuffix("_prod")) || name == "ema_rsi_prod",
        s"$name has no non-prod sibling")
    }
    val base = qs -- prodTwins
    assert(os.size.toDouble / base.size >= 0.85, s"${os.size}/${base.size}")
  }

  test("entry returns processed rows with all indicator columns") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    graft.operators.Indicators.indicatorCols.foreach(c => assert(df.columns.contains(c)))
  }
}
