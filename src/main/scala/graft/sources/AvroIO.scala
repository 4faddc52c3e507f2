package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro Object Container File round-trip on the Avro CORE
  * library (`avro-1.12.1.jar` ships with Spark; the `spark-avro`
  * CONNECTOR does not in this environment, so `format("avro")` cannot
  * resolve — this module supplies the wire format the log-pipeline world
  * actually exchanges, without the connector).
  *
  * Scale shape mirrors a FileFormat sink/source:
  *   - write: each input partition streams its rows through ONE
  *     `DataFileWriter` into `part-<pid>.avro` (executor-side, zero
  *     driver involvement, deflate-codec container blocks);
  *   - read: the driver lists file names only (O(#files), the same
  *     listing every file source pays) and each file is parsed by one
  *     task via `DataFileReader` — reader-schema evolution and block
  *     skipping come free from the container format.
  *
  * Types cover the analytic core (long/int/double/float/string/binary/
  * boolean, all nullable via `[null, T]` unions — the Avro convention);
  * anything else fails loudly at schema build, not silently at read. */
object AvroIO {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported Spark type $other")
  }

  /** Spark StructType → Avro record schema (nullable fields become
    * `[null, T]` unions, the standard Avro optionality encoding). */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val b = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(b) { (fb, f) =>
      val t = avroType(f.dataType)
      // null is a valid default ONLY for the [null, T] union branch; a
      // non-nullable field must declare no default or Avro 1.12's
      // SchemaBuilder rejects the schema at build time
      if (f.nullable)
        fb.name(f.name).`type`(Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), t))).withDefault(null)
      else
        fb.name(f.name).`type`(t).noDefault()
    }.endRecord()
  }

  /** Write `df` as one Avro container file per partition under `path`.
    * The schema travels in each file's header (self-describing), so a
    * reader needs no side channel. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString // Schema is not serializable
    val dir = new java.io.File(path)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    dir.mkdirs()
    df.foreachPartition { (rows: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new java.io.File(dir, f"part-$pid%05d.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(schema, out)
      try rows.foreach { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < st.length) {
          val v = r.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other          => other
          }
          rec.put(i, v)
          i += 1
        }
        w.append(rec)
      } finally w.close()
    }
  }

  /** Read every `part-*.avro` under `path` back into a DataFrame with
    * `st`'s types: one task per file (sc.parallelize over NAMES — only
    * strings ship from the driver), records decoded iterator-style. */
  def read(spark: SparkSession, path: String, st: StructType): DataFrame = {
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"AvroIO.read: no part-*.avro under $path")
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val rd = new DataFileReader[GenericRecord](
          new java.io.File(f), new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = { val h = rd.hasNext; if (!h) rd.close(); h }
          def next(): Row = {
            val rec = rd.next()
            Row.fromSeq(st.fields.indices.map { i =>
              rec.get(i) match {
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case other => other
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, st)
  }
}
