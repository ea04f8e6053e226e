package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PLINK text ingestion — S1 (`.raw` matrix scan), S2 (chunked scan),
  * S3 (`.fam` metadata scan), S4 (header/colname scan). Reference
  * `daxos/read.py:48-96,153-156`.
  *
  * A `.raw` file is whitespace-delimited with a header row; columns 0-5
  * are `FID IID PAT MAT SEX PHENOTYPE`, columns 6+ are per-SNP dosages
  * named `rsID_ALLELE`. S2's bounded-RAM chunked ingest is free here:
  * Spark splits text files into line-ranged tasks, so one `csv` scan IS
  * the chunked read. Missing dosages ("NA") become Float.NaN to mirror
  * the reference's IEEE-NaN missingness convention (§1.2).
  */
object Plink {

  val metaCols: Seq[String] = Seq("FID", "IID", "PAT", "MAT", "SEX", "PHENOTYPE")

  /** S4 — header scan: read ONLY the first line, split on whitespace.
    * Cheap at any file size (single partition, limit 1).
    */
  def readHeader(spark: SparkSession, path: String): Seq[String] =
    spark.read.textFile(path).limit(1).head().trim.split("\\s+").toSeq

  /** SNP names in file order (header minus the 6 metadata columns). */
  def snpNames(spark: SparkSession, path: String): Seq[String] = {
    val h = readHeader(spark, path)
    require(h.take(6).map(_.toUpperCase) == metaCols,
      s"not a PLINK .raw header: ${h.take(6).mkString(",")}")
    h.drop(6)
  }

  /** The cols side table `(pos, snp)` (reference `/cols`). */
  def colsTable(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    snpNames(spark, path).zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("pos", "snp")
  }

  /** S1/S2 — full `.raw` scan to the bundle row shape (§1.4):
    * metadata columns + `features` array<float> + recoded `label`.
    *
    * P4 recode is applied here exactly as `daxos/read.py:91-96`: iff
    * max(PHENOTYPE) == 2 (PLINK 1/2 case-control coding), label =
    * phenotype − 1, else label = phenotype unchanged.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val names = readHeader(spark, path)
    require(names.take(6).map(_.toUpperCase) == metaCols,
      s"not a PLINK .raw header: ${names.take(6).mkString(",")}")
    val schema = StructType(
      names.take(6).map(n => StructField(n, StringType)) ++
        names.drop(6).map(n => StructField(n, FloatType)))
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", " ")
      .option("nullValue", "NA")
      .option("nanValue", "nan")
      .schema(schema)
      .csv(path)
    val snps = names.drop(6)
    val features = array(snps.map(n =>
      coalesce(col(s"`$n`").cast("float"), lit(Float.NaN))): _*)
    val base = raw.select(
      col("FID").as("fid"), col("IID").as("iid"),
      col("PAT").as("pat"), col("MAT").as("mat"),
      col("SEX").cast("float").as("sex"),
      col("PHENOTYPE").cast("float").as("phenotype"),
      features.as("features"))
    val mx = Option(base.agg(max(col("phenotype"))).head().get(0))
      .map(_.asInstanceOf[Number].floatValue)
    val label =
      if (mx.contains(2f)) col("phenotype") - 1f else col("phenotype")
    base.withColumn("label", label.cast("float"))
  }

  /** S3 — `.fam`-style metadata scan: exactly the first 6 whitespace
    * columns, no header (`daxos/read.py:86-96` dtypes: strings + floats).
    */
  def readFam(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("fid", StringType), StructField("iid", StringType),
      StructField("pat", StringType), StructField("mat", StringType),
      StructField("sex", FloatType), StructField("phenotype", FloatType)))
    spark.read
      .option("header", "false")
      .option("delimiter", " ")
      .schema(schema)
      .csv(path)
  }
}
