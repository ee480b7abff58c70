package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning over a FILE MANIFEST — the
  * layout-maintenance operator a long-lived table needs once ingest and
  * CDC have littered partitions with small files.
  *
  * Input: one row per file (partition key, orderable file id, byte
  * size). Output: one row per planned merge group. Files are packed in
  * file order (merge groups read sequentially — the manifest is never
  * reordered): a file's bin is its starting byte offset DIV target, so a
  * new bin opens once the running total passes the target. Guarantees,
  * spec-pinned (`CompactionPlannerPropertySpec`):
  *   - complete: every file lands in exactly one bin;
  *   - contiguous: each partition's bins cover consecutive file-id runs;
  *   - bounded: bin_bytes < target + max(file bytes) — only the file
  *     straddling a boundary can push a bin past target.
  *
  * Scale shape: the plan runs on METADATA (~10⁶ manifest rows where the
  * table is 100 TB) — one window over (partition, file order) plus one
  * groupBy; the planner never touches data bytes. Executing the plan is
  * the ordinary read-group/write-one rewrite, not this operator.
  */
object CompactionPlanner {

  /** `files`: (part: String, file_id: Long, bytes: Long). Returns
    * (part, bin, n_files, bin_bytes, first_file, last_file).
    */
  def plan(files: DataFrame, target: Long,
           partCol: String = "source", fileCol: String = "file_id",
           bytesCol: String = "bytes"): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("__cum", sum(bytesCol).over(w))
      .withColumn("bin", expr(s"(__cum - $bytesCol) DIV $target"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(bytesCol).as("bin_bytes"),
        min(fileCol).as("first_file"),
        max(fileCol).as("last_file"))
      .orderBy(col(partCol), col("bin"))
  }
}
