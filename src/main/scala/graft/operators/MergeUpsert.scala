package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE: apply a keyed changelog (upserts + deletes) to a snapshot
  * in one pass — the engine-side semantics of the warehouse `MERGE INTO`
  * statement (and of the reference's SCD1 upsert sinks, reference
  * `spark-job/etl_job.py:431-448`, replayed as a batch set operation
  * instead of per-row sink writes). [[graft.QueriesWarehouse]]'s
  * `scd2_history` keeps every version; this keeps exactly the post-merge
  * state:
  *
  *  - key in snapshot, no changelog row        → snapshot row survives
  *  - key in both, op = upsert                 → changelog row wins
  *  - key in both, op = delete                 → row dropped
  *  - key only in changelog, op = upsert       → inserted
  *  - key only in changelog, op = delete       → no-op (delete of absent)
  *
  * == Scale shape ==
  * One full-outer equi-join on the merge key — a single shuffle of
  * snapshot + changelog, no driver materialization, no per-row sink
  * round-trips. At 100 TB the changelog is typically ≪ the snapshot, so
  * AQE plans the changelog side as the (possibly broadcast) build side;
  * nothing here prevents that. The file-rewrite half of a production
  * MERGE (copy-on-write of touched partitions) is the compaction
  * machinery in [[graft.sources.Compaction]]; this operator is the
  * row-semantics half that decides WHAT the rewritten rows are.
  *
  * `changes` must carry the key columns, the same value columns as
  * `target`, and `opCol` with values "U" (upsert) or "D" (delete); at
  * most one changelog row per key (pre-collapse a multi-row log with a
  * latest-wins window first — the `merge_upsert` query key shows the
  * recipe). Null ops are rejected loudly rather than guessed at.
  */
object MergeUpsert {

  def applyChangelog(target: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String): DataFrame = {
    val valueCols = target.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ valueCols :+ opCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"applyChangelog: changes is missing columns ${missing.mkString(", ")}")
    val ch = changes.select(
      keyCols.map(col) ++
        (valueCols.map(c => col(c).as(s"_ch_$c")) :+ col(opCol).as("_op")): _*)
    val applied = when(col("_op") === lit("U"), lit(true))
    target
      .join(ch, keyCols, "full_outer")
      // assert the U/D contract before using it to route rows: a typo'd
      // op silently keeping/dropping rows is the worst failure mode here
      .withColumn("_op", when(col("_op").isNull || col("_op").isin("U", "D"),
        col("_op")).otherwise(raise_error(concat(
          lit(s"applyChangelog: bad $opCol value "), col("_op")))))
      .filter(!(col("_op") <=> lit("D")))
      .select(keyCols.map(col) ++ valueCols.map(c =>
        when(applied, col(s"_ch_$c")).otherwise(col(c)).as(c)): _*)
  }
}
