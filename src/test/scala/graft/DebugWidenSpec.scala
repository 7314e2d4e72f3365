package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
class DebugWidenSpec extends SparkSpec {
  test("declared schema + basePath partition col behavior") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_widen2_").toString
    Seq((1, "a", 10)).toDF("k", "part", "v").write.partitionBy("part").parquet(s"$d/t1")
    // data files carry (k INT, v INT); dir carries part=a
    val dataOnly = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    try {
      val df = spark.read.option("basePath", s"$d/t1").schema(dataOnly).parquet(s"$d/t1/part=a")
      println("NOPART_COLS: " + df.columns.mkString(",") + " ROWS: " + df.collect().mkString(";"))
    } catch { case e: Throwable => println("NOPART_ERR: " + e.getMessage.take(200)) }
    val withPart = StructType(dataOnly :+ StructField("part", StringType))
    val df2 = spark.read.option("basePath", s"$d/t1").schema(withPart).parquet(s"$d/t1/part=a")
    println("WITHPART_COLS: " + df2.columns.mkString(",") + " ROWS: " + df2.collect().mkString(";"))
  }
}
