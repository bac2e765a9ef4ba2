package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinned-fixture parquet IO: write a (small) DataFrame as ONE parquet
  * FILE at an exact path, atomically replaced — the DuckDB oracle reads
  * that literal file (`read_parquet('<path>')`), so the swap must never
  * leave it absent or half-written. Shared by the PQ codebook and
  * SemDeDup centroid fixtures.
  */
object FixtureIO {

  /** Write `df` as a single parquet file at `path` (not a directory).
    * Hadoop FileSystem API throughout so the staging works on any
    * scheme; the final swap uses POSIX atomic rename on local disk
    * (Hadoop LocalFs's overwrite-rename is delete-then-rename, which
    * opens exactly the missing-file window) and FileContext OVERWRITE
    * elsewhere (atomic on HDFS, best-effort on object stores —
    * fixtures are repo-local in practice). */
  def writeSingleParquet(spark: SparkSession, df: DataFrame,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = target.getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp))
      .find(f => f.getPath.getName.endsWith(".parquet"))
      .getOrElse(throw new java.io.IOException(
        s"fixture save: no parquet part written under $tmp"))
    Option(target.getParent).foreach(fs.mkdirs)
    if (fs.getScheme == "file") {
      val src = java.nio.file.Paths.get(part.getPath.toUri.getPath)
      val dst = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
        .rename(part.getPath, target,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    fs.delete(new Path(tmp), true)
  }
}
