package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress harness for the q152 live-Derby MERGE upsert: repeat the
  * two-batch lifecycle, assert the final table row count every cycle.
  * Run with more partitions than the gate query to amplify Derby's
  * lock-escalation contention.
  */
object StressQ152 {
  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(30)
    val parts = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("derby.stream.error.file", "/tmp/derby-stress.log")
    val url = "jdbc:derby:memory:graftstress;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val orders = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey").as("O_ORDERKEY"),
        round(col("o_totalprice") * 100).cast("long").as("CENTS"))
    val b1 = orders.filter(col("O_ORDERKEY") <= 2000)
    val b2 = orders.filter(col("O_ORDERKEY") > 1000 && col("O_ORDERKEY") <= 3000)
      .withColumn("CENTS", col("CENTS") + 77700L)
    val expect = orders.filter(col("O_ORDERKEY") <= 3000).count()
    var bad = 0
    for (i <- 1 to cycles) {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute("DROP TABLE APP.ORDERS_UP") catch { case _: Throwable => () }
        st.execute("CREATE TABLE APP.ORDERS_UP (O_ORDERKEY BIGINT PRIMARY KEY, CENTS BIGINT)")
      } finally conn.close()
      graft.sink.JdbcSink.upsert(b1.repartition(parts), url, "APP.ORDERS_UP",
        mergeKeys = Seq("O_ORDERKEY"))
      graft.sink.JdbcSink.upsert(b2.repartition(parts), url, "APP.ORDERS_UP",
        mergeKeys = Seq("O_ORDERKEY"))
      val p = new java.util.Properties()
      p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      val got = spark.read.jdbc(url, "APP.ORDERS_UP", p).count()
      if (got != expect) { bad += 1; println(s"cycle $i: LOST ROWS got=$got expect=$expect") }
      else println(s"cycle $i: ok ($got)")
    }
    println(s"bad cycles: $bad / $cycles")
    spark.stop()
  }
}
