package graft.tools
import org.apache.spark.sql.SparkSession
object SnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").appName("snowprobe").getOrCreate()
    spark.sql("SELECT snowball_stem('posibilitate','romanian') a, snowball_stem('говорившие','russian') b").show(false)
    spark.stop()
  }
}
