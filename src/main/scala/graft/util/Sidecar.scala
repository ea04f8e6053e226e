package graft.util

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

/** DRIVER-SIDE parquet I/O for the stores' tiny metadata sidecars
  * (meta/, satstats/, evalmeta/, prefstats/, hotgrams/, ingest
  * markers): single-digit-row tables that were previously written with
  * `repartition(1).write.parquet` and read with
  * `spark.read.parquet(...).head()` — each a FULL Spark job (plan +
  * schedule + task + committer), dozens of which serialize inside every
  * store lifecycle op. Metadata this small never needs the cluster:
  * writing it from the driver through parquet-mr directly is the
  * public Delta/Iceberg manifest pattern, removes a cluster round-trip
  * per op at any scale, and keeps the on-disk format IDENTICAL — plain
  * parquet files under the sidecar directory, readable by
  * `spark.read.parquet` (and by older readers of these stores), file
  * names carrying the `part-` prefix the file-count maintenance
  * triggers key on.
  *
  * Durability contract matches the Spark writes it replaces: files are
  * staged under a dot-prefixed temp name (invisible to readers) and
  * renamed in atomically; `write` (overwrite) deletes the directory
  * first, so a crash mid-overwrite leaves a missing/empty sidecar —
  * exactly the exposure of `mode("overwrite")`, and recovered the same
  * way (ensure()'s rebuild path / the IngestMarker contract).
  *
  * Supported column types: long, int, double, boolean, string — the
  * sidecar schemas' closed set. Anything else belongs in a real table.
  */
object Sidecar {

  private def parquetType(f: StructField): Type = {
    val b = f.dataType match {
      case LongType => Types.required(PrimitiveType.PrimitiveTypeName.INT64)
      case IntegerType => Types.required(PrimitiveType.PrimitiveTypeName.INT32)
      case DoubleType => Types.required(PrimitiveType.PrimitiveTypeName.DOUBLE)
      case BooleanType => Types.required(PrimitiveType.PrimitiveTypeName.BOOLEAN)
      case StringType => Types.required(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType())
      case other => throw new IllegalArgumentException(
        s"Sidecar supports long/int/double/boolean/string columns, got $other")
    }
    b.named(f.name)
  }

  private def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(parquetType(f)))
    b.named("sidecar")
  }

  /** Overwrite `path` with one parquet file holding `rows`. */
  def write(spark: SparkSession, path: String, schema: StructType,
      rows: Seq[Seq[Any]]): Unit = {
    Fs.rmTree(spark, path)
    append(spark, path, schema, rows)
  }

  /** Add one parquet file holding `rows` to `path` (created if absent) —
    * the `mode("append")` analog. */
  def append(spark: SparkSession, path: String, schema: StructType,
      rows: Seq[Seq[Any]]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir): Unit
    val name = s"part-00000-${java.util.UUID.randomUUID()}.parquet"
    val tmp = new Path(dir, s".$name.tmp")
    val mt = messageType(schema)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(tmp, conf))
      .withConf(conf)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      val factory = new SimpleGroupFactory(mt)
      rows.foreach { r =>
        require(r.length == schema.length,
          s"row arity ${r.length} != schema arity ${schema.length}")
        val g = factory.newGroup()
        r.zipWithIndex.foreach { case (v, i) =>
          require(v != null, s"null in sidecar column ${schema(i).name}")
          // numeric values coerce THROUGH the schema (Scala's Seq
          // inference widens mixed Int/Long literals to Long, so a
          // strict cast would throw on an int column)
          schema(i).dataType match {
            case LongType =>
              // a Long that was silently widened to Double by Scala's
              // Seq inference would lose bits past 2^53 — refuse
              // floating inputs to integral columns (callers pass
              // Seq[Any] to stop the widening)
              require(v.isInstanceOf[Long] || v.isInstanceOf[Int],
                s"non-integral ${v.getClass.getSimpleName} for long " +
                  s"column ${schema(i).name} — widened literal?")
              g.add(i, v.asInstanceOf[Number].longValue())
            case IntegerType =>
              require(v.isInstanceOf[Long] || v.isInstanceOf[Int],
                s"non-integral ${v.getClass.getSimpleName} for int " +
                  s"column ${schema(i).name} — widened literal?")
              val n = v.asInstanceOf[Number]
              require(n.longValue() == n.intValue(),
                s"value $n overflows int column ${schema(i).name}")
              g.add(i, n.intValue())
            case DoubleType => g.add(i, v.asInstanceOf[Number].doubleValue())
            case BooleanType => g.add(i, v.asInstanceOf[Boolean])
            case StringType => g.add(i, v.asInstanceOf[String])
            case other => throw new IllegalArgumentException(s"$other")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
    if (!fs.rename(tmp, new Path(dir, name)))
      throw new java.io.IOException(s"rename $tmp -> $name failed")
  }

  private def sparkType(t: PrimitiveType): DataType =
    t.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT64 => LongType
      case PrimitiveType.PrimitiveTypeName.INT32 => IntegerType
      case PrimitiveType.PrimitiveTypeName.DOUBLE => DoubleType
      case PrimitiveType.PrimitiveTypeName.BOOLEAN => BooleanType
      case PrimitiveType.PrimitiveTypeName.FLOAT => FloatType
      case PrimitiveType.PrimitiveTypeName.BINARY => StringType
      case other => throw new IllegalArgumentException(
        s"Sidecar cannot read parquet primitive $other")
    }

  /** Every row of every (non-hidden) parquet file under `path`, as
    * schema-carrying Rows (`getAs[T]("name")` works like the
    * `spark.read.parquet(...).head()` it replaces). Reads files the
    * stores wrote through EITHER path — Spark task output or
    * [[write]]/[[append]] output. Throws if the directory is missing
    * or empty of data files, like `spark.read.parquet` on a missing
    * path — callers treat both the same way. */
  def readRows(spark: SparkSession, path: String): Seq[Row] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir))
      throw new java.io.FileNotFoundException(s"sidecar path $path missing")
    val files = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
    val out = Seq.newBuilder[Row]
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f.getPath)
        .withConf(conf).build()
      try {
        var g: Group = reader.read()
        while (g != null) {
          val gt = g.getType
          val n = gt.getFieldCount
          val fields = new Array[StructField](n)
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            val ft = gt.getType(i).asPrimitiveType()
            val dt = sparkType(ft)
            fields(i) = StructField(ft.getName, dt)
            vals(i) =
              if (g.getFieldRepetitionCount(i) == 0) null
              else dt match {
                case LongType => g.getLong(i, 0)
                case IntegerType => g.getInteger(i, 0)
                case DoubleType => g.getDouble(i, 0)
                case BooleanType => g.getBoolean(i, 0)
                case FloatType => g.getFloat(i, 0)
                case StringType => g.getString(i, 0)
                case other => throw new IllegalArgumentException(s"$other")
              }
            i += 1
          }
          out += new GenericRowWithSchema(vals, StructType(fields.toSeq))
          g = reader.read()
        }
      } finally reader.close()
    }
    val rows = out.result()
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(
        s"sidecar path $path has no data files")
    rows
  }

  /** First row of the sidecar — the `.head()` replacement. */
  def readHead(spark: SparkSession, path: String): Row = {
    val rows = readRows(spark, path)
    require(rows.nonEmpty, s"sidecar at $path is empty")
    rows.head
  }
}
