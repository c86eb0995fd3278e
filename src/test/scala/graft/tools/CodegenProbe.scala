package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.GraftFunctions.register(spark)
    val df = spark.range(10).selectExpr("array(id, id+1) as th", "cast(id as string) as t")
      .select(graft.spark.GraftFunctions.minhash_sig(col("th")).as("m"),
        graft.spark.GraftFunctions.simhash_bits(col("th")).as("s"),
        graft.spark.GraftFunctions.norm_fingerprint(col("t")).as("f"))
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_WSCG=" + plan.contains("WholeStageCodegen"))
    val formatted = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(formatted.split('\n').take(8).mkString("\n"))
    df.collect().foreach(_ => ())
    println("OK")
    spark.stop()
  }
}
