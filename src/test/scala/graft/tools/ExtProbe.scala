package graft.tools
import org.apache.spark.sql.SparkSession
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = spark.sql(
      """SELECT size(css_select(parse_html('<div><p>a</p><p>b</p></div>'), 'p')) AS n""")
      .collect().head.getInt(0)
    println("EXT_SELECT_N=" + n)
    spark.stop()
  }
}
