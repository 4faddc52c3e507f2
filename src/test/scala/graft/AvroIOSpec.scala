package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Direct AvroIO coverage beyond the oracled supplier round trip: the
  * supplier table's columns are all nullable, so the key alone never
  * exercises the non-nullable schema branch (null is a legal default only
  * for the [null, T] union — a plain field must declare noDefault or
  * Avro's SchemaBuilder rejects the record at build time). */
class AvroIOSpec extends SparkSpec {

  test("round trip preserves non-nullable fields, real nulls, and binary") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, true, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_nn").toString
    graft.sources.AvroIO.write(df, dir)
    val back = graft.sources.AvroIO.read(spark, dir, st)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha" &&
      back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(4))
    assert(back(2).getDouble(2) == -0.25 &&
      back(2).getAs[Array[Byte]](4).toSeq == Seq.empty)
    // schema carries the nullability contract into Avro form
    val avro = graft.sources.AvroIO.avroSchema(st)
    assert(avro.getField("id").schema().getType ==
      org.apache.avro.Schema.Type.LONG) // plain, not a union
    assert(avro.getField("name").schema().getType ==
      org.apache.avro.Schema.Type.UNION)
  }

  test("unsupported Spark type fails loudly at schema build") {
    val st = StructType(Seq(
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val ex = intercept[IllegalArgumentException](
      graft.sources.AvroIO.avroSchema(st))
    assert(ex.getMessage.contains("unsupported"))
  }
}
