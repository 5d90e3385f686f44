package graft

import org.apache.spark.sql.functions._

import graft.operators.{MergeUpsert, ScaleOps}

/** Hand-computed contracts for the relational additions: batch MERGE
  * semantics (all five key/op cases) and exact triangle counting
  * (known graph, input normalization).
  */
class RelationalSpec extends SparkSpec {

  test("applyChangelog: update / delete / insert / survive / absent-delete") {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 10.0), // updated by changelog
      (2L, "b", 20.0), // deleted by changelog
      (3L, "c", 30.0)  // no changelog row: survives unchanged
    ).toDF("k", "s", "x")
    val changes = Seq(
      (1L, "a2", 11.0, "U"),
      (2L, "b", 20.0, "D"),
      (4L, "d", 40.0, "U"), // insert
      (5L, "e", 50.0, "D")  // delete of absent key: no-op
    ).toDF("k", "s", "x", "op")
    val got = MergeUpsert.applyChangelog(target, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChangelog: null value in an upsert overwrites, not coalesces") {
    import spark.implicits._
    val target = Seq((1L, Some("a"))).toDF("k", "s")
    val changes = Seq((1L, None: Option[String], "U")).toDF("k", "s", "op")
    val got = MergeUpsert.applyChangelog(target, changes, Seq("k"), "op")
      .as[(Long, Option[String])].collect().toSeq
    assert(got === Seq((1L, None)))
  }

  test("applyChangelog: unknown op value fails loudly") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq((1L, "a2", "upsert")).toDF("k", "s", "op")
    val e = intercept[Exception] {
      MergeUpsert.applyChangelog(target, changes, Seq("k"), "op").collect()
    }
    assert(e.getMessage != null)
  }

  test("applyChangelog: missing changelog columns rejected at plan time") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq((1L, "U")).toDF("k", "op") // no value column s
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.applyChangelog(target, changes, Seq("k"), "op")
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("triangleCount: K4 plus a pendant node, noisy input normalized") {
    import spark.implicits._
    val k4 = for {
      u <- 1L to 4L; v <- 1L to 4L if u < v
    } yield (u, v)
    // duplicates, reversed duplicates, a self loop, and a pendant edge:
    // normalization must leave K4 + (1,5)
    val noisy = (k4 ++ k4.map { case (u, v) => (v, u) } ++
      Seq((2L, 2L), (1L, 5L), (5L, 1L))).toDF("src", "dst")
    val row = ScaleOps.triangleCount(noisy).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((5L, 7L, 4L)))
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    val edges = (for { u <- 1L to 3L; v <- 11L to 13L } yield (u, v))
      .toDF("src", "dst")
    val row = ScaleOps.triangleCount(edges).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((6L, 9L, 0L)))
  }

  test("bfsLevels: min-hop levels on a known graph, cap honored") {
    import spark.implicits._
    // path 1-2-3-4-5 plus shortcut 1-4: levels from {1} are
    // 1:0, 2:1, 4:1, 3:2 (via 2 or 4), 5:2 (via 4) — the shortcut must
    // win over the 3-hop path; 6-7 is a separate unreachable component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (6L, 7L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = graft.operators.ScaleOps.bfsLevels(edges, seeds, maxLevel = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // cap 1 stops the expansion
    val capped = graft.operators.ScaleOps.bfsLevels(edges, seeds, maxLevel = 1)
      .as[(Long, Int)].collect().toMap
    assert(capped === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("bfsLevels: isolated seed stays at level 0; reversed edges reach it") {
    import spark.implicits._
    val edges = Seq((10L, 20L)).toDF("src", "dst")
    val got = graft.operators.ScaleOps
      .bfsLevels(edges, Seq(99L, 20L).toDF("node"), maxLevel = 3)
      .as[(Long, Int)].collect().toMap
    // 99 is in no edge (level 0 only); 20 reaches 10 against edge direction
    assert(got === Map(99L -> 0, 20L -> 0, 10L -> 1))
  }

  test("triangleCount: empty edge set yields the zero row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val row = ScaleOps.triangleCount(empty).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((0L, 0L, 0L)))
  }
}
