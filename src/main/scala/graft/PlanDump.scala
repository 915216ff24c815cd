package graft

import org.apache.spark.sql.SparkSession

/** Debug harness: dump formatted physical plans for named queries
  * (`java … graft.PlanDump q153_attribution …`) — the .explain audit
  * loop the round process prescribes, kept as a main so it needs no
  * REPL. Not part of the library surface. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
  }
}
