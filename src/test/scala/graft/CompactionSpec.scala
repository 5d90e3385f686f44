package graft

import java.nio.file.Files
import graft.sources.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges many small files into few, preserving data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/data"
    // simulate 20 micro-batch appends -> >=20 small files
    (1 to 20).foreach { i =>
      Seq((i.toLong, s"payload_$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = Compaction.dataFileCount(spark, dir)
    assert(before >= 20)
    val checksum = spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq

    Compaction.compact(spark, dir, targetBytes = 1L << 30)
    val after = Compaction.dataFileCount(spark, dir)
    assert(after == 1, s"expected 1 file after compaction, got $after")
    val checksum2 = spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
    assert(checksum == checksum2, "compaction changed the data")
  }

  test("schema evolution: widened batches read back unified under mergeSchema") {
    // the long-lived-pipeline reality: a later batch adds a column. The
    // default read takes one file's footer and silently DROPS the new
    // column if it samples an old file; mergeSchema unions footers so
    // old rows surface the added column as null — pin both behaviors so
    // an ingestion consumer knows which read to use.
    val dir = Files.createTempDirectory("graft_evolve").toString + "/data"
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.isNullAt(merged.columns.indexOf("score"))))
    assert(rows.toSeq == Seq((1L, true), (2L, false)),
      "old-batch rows must surface the evolved column as null")
    // and compaction of an evolved directory must preserve the union
    Compaction.compact(spark, dir, targetBytes = 1L << 30, mergeSchema = true)
    val after = spark.read.parquet(dir)
    assert(after.columns.sorted.toSeq == Seq("id", "score", "v"),
      "compaction dropped the evolved column")
    assert(after.count() == 2)
  }
}
