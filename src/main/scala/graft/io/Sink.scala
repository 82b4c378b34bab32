package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet sink with the reference's write dispositions (load_to_bq,
  * etl.py:1156–1232; disposition default WRITE_APPEND, etl.py:64).
  * Schema is enforced by Align BEFORE the write, matching the
  * reference's autodetect=False load config (etl.py:1190).
  */
object Sink {
  def mode(disposition: String): SaveMode = disposition match {
    case "WRITE_APPEND" => SaveMode.Append
    case "WRITE_TRUNCATE" => SaveMode.Overwrite
    case "WRITE_EMPTY" => SaveMode.ErrorIfExists
    case other => throw new IllegalArgumentException(s"Unknown write disposition: $other")
  }

  def write(df: DataFrame, path: String, disposition: String = "WRITE_APPEND"): Unit =
    df.write.mode(mode(disposition)).parquet(path)

  /** Small-files compaction: rewrite a parquet table into
    * ceil(bytes / targetBytes) files. Append-heavy ingest (one file per
    * work item, §2.9) degrades scans at scale — NameNode/listing
    * pressure and per-file open cost; periodic compaction is the
    * standard fix. Rewrites through a temp dir + atomic-ish swap so a
    * crash never leaves the table half-deleted.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "__compact_old")
    fs.delete(bak, true)
    if (!fs.rename(hPath, bak)) throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(bak, hPath) // restore
      throw new java.io.IOException(s"compact: cannot swap in compacted $path")
    }
    fs.delete(bak, true)
    nFiles.toLong
  }
}
