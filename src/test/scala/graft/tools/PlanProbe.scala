package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_links")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    println("PARSE_COUNT=" + "parse_html".r.findAllIn(p).length)
    println("SELECT_COUNT=" + "css_select".r.findAllIn(p).length)
    val df2 = graft.SparkEntry.queries("q_dom_nth_child")(spark, "/root/testdata/sf0.001")
    println("PARSE_COUNT_NTH=" + "parse_html".r.findAllIn(df2.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
