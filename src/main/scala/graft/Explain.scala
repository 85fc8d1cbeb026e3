package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the queries whose shape
  * matters at scale (broadcasts, pushdown, codegen spans). Not part of the
  * driver contract. Usage: runMain graft.Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_flagship", "q04_filter_battery", "q24_topk", "q12_asof_join")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
