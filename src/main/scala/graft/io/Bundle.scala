package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Bundle store — S5 (ML read), S6 (metadata read), S7 (ML write).
  * Replaces the reference's 4-key HDF5 container (`daxos/read.py:99-181`)
  * with one Parquet dataset + a tiny `cols` Parquet table (§1.4).
  *
  * The row-bundle layout makes the reference's 3-way shape asserts
  * (read.py:103-105) impossible to violate by construction — X row i, y
  * row i and metadata row i are literally the same row. What remains to
  * validate at read time is (a) required columns exist, (b) the features
  * width equals the cols-table length — checked on ONE row, not a scan.
  *
  * Scale: `chunkRows` maps the reference's HDF5/dask chunking to a
  * target Parquet partition row count at write (read.py:165-171); at
  * read, partitioning is governed by files.maxPartitionBytes and the
  * persisted block_id column keeps splits chunk-aligned regardless.
  */
object Bundle {

  val requiredCols: Seq[String] =
    Seq("fid", "iid", "sex", "phenotype", "label", "features", "block_id")

  def bundleDir(dir: String): String = s"$dir/bundle"
  def colsDir(dir: String): String = s"$dir/cols"

  /** S7 — write bundle + cols. */
  def write(bundle: DataFrame, cols: DataFrame, dir: String): Unit = {
    bundle.write.mode("overwrite").parquet(bundleDir(dir))
    cols.coalesce(1).write.mode("overwrite").parquet(colsDir(dir))
  }

  /** S6 — the cols side table. */
  def readCols(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(colsDir(dir))

  /** S5 — validated bundle read. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(bundleDir(dir))
    val missing = requiredCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"bundle at $dir missing columns: $missing")
    require(df.schema("features").dataType.isInstanceOf[ArrayType],
      s"bundle features must be an array column")
    val p = readCols(spark, dir).count()
    val width = df.select(size(col("features"))).head().getInt(0)
    require(width == p,
      s"features width $width != cols table length $p (bundle at $dir)")
    df
  }
}
