package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{GraftFunctions => F, SynthDocs}
object FmtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SynthDocs.partDocs(spark, "/root/testdata/sf0.001")
    val r = docs.filter(col("doc_id") === "7")
      .select(col("html"),
        F.dom_formatted_text(col("nodes"), F.css_select(col("nodes"), "#main")).as("ft"))
      .collect().head
    println("HTML=" + r.getString(0))
    println("FT=[" + r.getString(1).replace("\n", "\\n") + "]")
    spark.stop()
  }
}
