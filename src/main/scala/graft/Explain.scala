package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_CONF="k=v;k2=v2": session confs to set before
    // planning — lets a plan dump capture a conf-gated BEFORE spelling
    // (the forked run JVM does not inherit sbt's -D flags).
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach {
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"========== $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
