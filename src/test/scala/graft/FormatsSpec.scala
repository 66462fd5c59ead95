package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.ParityQueries.t

/** Source/sink format breadth: the engine standardizes on Parquet but a
  * replacement engine must round-trip the interchange formats too.
  */
class FormatsSpec extends SparkSuite {

  lazy val orders = t(spark, sf0001, "orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))

  test("CSV round-trip with explicit schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == orders.count())
    assert(orders.exceptAll(back).count() == 0)
    assert(back.exceptAll(orders).count() == 0)
  }

  test("JSON-lines round-trip preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    orders.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema(orders.schema).json(dir)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("ORC round-trip preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("malformed CSV rows dead-letter under PERMISSIVE mode") {
    val dir = java.nio.file.Files.createTempDirectory("badcsv")
    java.nio.file.Files.writeString(dir.resolve("part.csv"),
      "1,2,OK,10.5\nnot_a_number,x,BAD,oops\n3,4,OK,20.0\n")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("s", StringType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir.toString)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(4)) == 2) // two clean rows
  }

  test("schema evolution: appended files with a new column merge on read") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    orders.limit(5).write.mode("overwrite").parquet(dir)
    // later pipeline version adds a column — appended alongside v1 files
    orders.limit(5).withColumn("o_channel", lit("web"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("o_channel"))
    assert(merged.count() == 10)
    // v1 rows surface the new column as null, v2 rows carry the value
    assert(merged.where(col("o_channel").isNull).count() == 5)
    assert(merged.where(col("o_channel") === "web").count() == 5)
    // without mergeSchema the first-listed footer wins — document that
    // evolved tables must be read with the option (or a catalog schema)
    val plain = spark.read.parquet(dir)
    assert(plain.count() == 10)
  }
}
