package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the stream_sessions cost floor: replays the key's exact
  * streaming query under knob combinations from env and prints per-batch
  * durations from the progress log, so state-store / session-merge /
  * no-data-batch effects are attributable instead of guessed. Usage:
  *   SPARK_GRAFT_SESSION_KNOBS=localMerge,noDataOff,parts=8 \
  *     sbt "runMain graft.SessionProbe [sfDir]"
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val knobs = sys.env.getOrElse("SPARK_GRAFT_SESSION_KNOBS", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val parts = knobs.collectFirst { case k if k.startsWith("parts=") =>
      k.stripPrefix("parts=").toInt }.getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warm-up
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts)
    if (knobs("localMerge"))
      s.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true")
    if (knobs("noDataOff"))
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if (knobs("rocksdb"))
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (knobs("shm"))
      s.conf.set("spark.sql.streaming.checkpointLocation",
        "/dev/shm/graft_probe_ckpt")
    if (knobs("asyncProgress"))
      s.conf.set("spark.sql.streaming.asyncProgressTrackingEnabled", "true")
    (1 to 3).foreach { run =>
      val schema = s.read.parquet(s"$sfDir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("value"))
      val qname = "session_probe_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = graft.streaming.MicroBatch.sessionStats(stream)
        .writeStream.outputMode("append").format("memory").queryName(qname)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = s.table(qname).count()
      val total = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.map(p =>
        s"b${p.batchId}:${p.durationMs.get("triggerExecution")}ms(in=${p.numInputRows})")
      println(f"[probe] knobs=${knobs.mkString("+")} run$run rows=$rows total=$total%.2fs ${batches.mkString(" ")}")
      if (knobs("json") && run == 3)
        q.recentProgress.foreach(p => println(s"[probe-json] ${p.json}"))
      s.catalog.dropTempView(qname)
    }
    spark.stop()
  }
}
