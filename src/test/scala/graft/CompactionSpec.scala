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
}
