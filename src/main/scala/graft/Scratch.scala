package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1).select(
      split(lit("abc"), "").as("chars"),
      expr("aggregate(split('abc',''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)").as("poly"),
      expr("ascii('')").as("ascii_empty"),
      expr("transform(sequence(0, 2), i -> concat_ws(' ', element_at(split('a b c d',' '), i+1), element_at(split('a b c d',' '), i+2)))").as("shingles2"),
      sha2(lit("hello"), 256).as("sha"),
      expr("bit_count(cast(7 as long))").as("bc"),
      expr("shiftright(96354L, 3) & 1").as("bit3"),
      expr("regexp_extract_all('abc12 de', '[a-z]+|[0-9]|[^a-z0-9 ]', 0)").as("toks"),
      expr("aggregate(zip_with(array(0.1F,0.2F), array(0.3F,0.4F), (x,y) -> cast(x as double) * cast(y as double)), 0D, (a,x) -> a + x)").as("dot")
    )
    df.show(false)
    df.printSchema()
    spark.stop()
  }
}
