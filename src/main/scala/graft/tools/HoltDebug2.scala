package graft.tools
import org.apache.spark.sql.SparkSession
object HoltDebug2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.CurationQueries17.holt.fn(spark, "/root/testdata/sf0.01")
      .filter("event_type = 'click'").show(false)
    // and the coalesce(1) path Verify uses
    graft.queries.CurationQueries17.holt.fn(spark, "/root/testdata/sf0.01")
      .coalesce(1)
      .filter("event_type = 'click'").show(false)
    spark.stop()
  }
}
