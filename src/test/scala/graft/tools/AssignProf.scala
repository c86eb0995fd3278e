package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Dev probe: IVF corpus→cell assignment, row-wise HOF argmax (r5 shape)
  * vs 16×-explode + window argmax (r4 shape), min-of-3 each, same session. */
object AssignProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Similarity.embeddings(spark, sfDir)
    println(s"vectors: ${emb.count()}")
    val cent = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$tag%-28s $t%.2f s")
    }

    time("new: row-wise HOF argmax") {
      Similarity.assignCells(emb, cent)
    }
    time("ivfTopK full (new)") {
      Similarity.ivfTopK(emb, nQueries = 20, k = 5)
    }
    time("new assigned -> capped") {
      Similarity.assignCells(emb, cent).groupBy("cell")
        .agg(slice(sort_array(collect_list(col("vec_id"))), 1, 1024).as("ids"))
        .select(col("cell"), explode(col("ids")).as("vec_id"))
    }
    time("probes branch alone") {
      val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
      emb.filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cent))
        .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 4)
        .select(col("vec_id").as("query_id"), col("cell"))
    }
    time("candIds (thru distinct)") {
      val capped = Similarity.assignCells(emb, cent).groupBy("cell")
        .agg(slice(sort_array(collect_list(col("vec_id"))), 1, 1024).as("ids"))
        .select(col("cell"), explode(col("ids")).as("vec_id"))
      val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
      val probes = emb.filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cent))
        .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 4)
        .select(col("vec_id").as("query_id"), col("cell"))
      probes.join(capped, Seq("cell"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .distinct()
    }
    time("old: explode+window argmax") {
      val scored = emb.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cent))
        .withColumn("ccos", expr(Similarity.cosineSql("embedding", "centroid")))
        .select("vec_id", "cell", "ccos")
      val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
      scored.withColumn("r", row_number().over(w))
        .filter(col("r") === 1).select("vec_id", "cell")
    }
    spark.stop()
  }
}
