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
}
