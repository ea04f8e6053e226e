package graft.util

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Cross-compatibility gates for the driver-side sidecar I/O that
  * replaced the stores' one-row `repartition(1).write.parquet` /
  * `spark.read.parquet(...).head()` round-trips: files written either
  * way must read identically through BOTH paths, because existing
  * stores on disk were written by Spark and new stores must stay
  * readable by `spark.read.parquet` (and by the DuckDB side of any
  * gate that inspects a store). */
class SidecarSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("n_docs", LongType),
    StructField("threshold", DoubleType),
    StructField("n_buckets", IntegerType),
    StructField("tag", StringType),
    StructField("flag", BooleanType)))

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete(): Unit
    d.getAbsolutePath
  }

  test("sidecar write is readable by spark.read.parquet, typed") {
    val dir = tmpDir("sidecar_w")
    Sidecar.write(spark, dir, schema,
      Seq(Seq(42L, 0.9, 64, "hello", true)))
    val df = spark.read.parquet(dir)
    val r = df.head()
    assert(r.getAs[Long]("n_docs") == 42L)
    assert(r.getAs[Double]("threshold") == 0.9)
    assert(r.getAs[Int]("n_buckets") == 64)
    assert(r.getAs[String]("tag") == "hello")
    assert(r.getAs[Boolean]("flag"))
    // and through an explicit schema, the stores' read idiom
    assert(spark.read.schema(schema).parquet(dir).count() == 1)
    Fs.rmRecursive(new java.io.File(dir))
  }

  test("sidecar reads spark-written files (the legacy stores)") {
    val dir = tmpDir("sidecar_r")
    val s = spark
    import s.implicits._
    Seq((7L, 1.5, 3, "x", false)).toDF("a", "b", "c", "d", "e")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val r = Sidecar.readHead(spark, dir)
    assert(r.getAs[Long]("a") == 7L)
    assert(r.getAs[Double]("b") == 1.5)
    assert(r.getAs[Int]("c") == 3)
    assert(r.getAs[String]("d") == "x")
    assert(!r.getAs[Boolean]("e"))
    Fs.rmRecursive(new java.io.File(dir))
  }

  test("append accumulates rows across files; overwrite replaces") {
    val dir = tmpDir("sidecar_a")
    val s2 = StructType(Seq(StructField("gram", LongType)))
    Sidecar.write(spark, dir, s2, Seq(Seq(1L), Seq(2L)))
    Sidecar.append(spark, dir, s2, Seq(Seq(3L)))
    assert(Sidecar.readRows(spark, dir).map(_.getLong(0)).sorted ==
      Seq(1L, 2L, 3L))
    assert(spark.read.parquet(dir).count() == 3)
    // append landed a second part- file: the fold triggers keyed on
    // Fs.dataFileCount keep seeing sidecar files
    assert(Fs.dataFileCount(spark, dir) == 2)
    Sidecar.write(spark, dir, s2, Seq(Seq(9L)))
    assert(Sidecar.readRows(spark, dir).map(_.getLong(0)) == Seq(9L))
    Fs.rmRecursive(new java.io.File(dir))
  }

  test("missing path fails like spark.read.parquet") {
    intercept[Exception] {
      Sidecar.readRows(spark, tmpDir("sidecar_m") + "/nope")
    }
  }

  test("mixed history: spark-written then sidecar-appended reads whole") {
    val dir = tmpDir("sidecar_mix")
    val s = spark
    import s.implicits._
    Seq((1L, 5L)).toDF("gram", "df")
      .repartition(1).write.mode("overwrite").parquet(dir)
    Sidecar.append(spark, dir,
      StructType(Seq(StructField("gram", LongType),
        StructField("df", LongType))), Seq(Seq(2L, -1L)))
    assert(spark.read.parquet(dir).count() == 2)
    assert(Sidecar.readRows(spark, dir).size == 2)
    Fs.rmRecursive(new java.io.File(dir))
  }
}
