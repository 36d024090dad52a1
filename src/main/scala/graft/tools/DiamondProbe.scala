package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: close the r14 `q_match_diamond` sf1 watch with DATA —
  * `DiamondProbe <sfDir>` prints, for the diamond pattern
  * (Customer-[locatedIn]->Nation<-[locatedIn]-Supplier,
  * n_name='NATION_3', c_acctbal>9000):
  *
  *  - result rows (the join's OUTPUT cardinality — for this pattern
  *    the intermediate IS the result: the final join is the last op
  *    before projection)
  *  - the pattern's intrinsic unfiltered cardinality Σ_n cust(n)·supp(n)
  *    (the Σdeg² quantity PLANS.md's r14 close-out names)
  *  - the filtered Σ cust(NATION_3,bal>9000)·supp(NATION_3)
  *
  * If wall ratio sf0.1→sf1 tracks the result-cardinality ratio, the
  * 16x wall growth is data-honest (the sf1 replicator holds nation at
  * 25 rows while customers/suppliers grow 10x each → ~100x rows per
  * nation) and the watch closes with no planner change.
  */
object DiamondProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val result = graft.SparkEntry.queries("q_match_diamond")(spark, sfDir)
    val t0 = System.nanoTime()
    val rows = result.count()
    val wall = (System.nanoTime() - t0) / 1e9

    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
    val custN = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("c_cnt"))
    val suppN = supp.groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("s_cnt"))
    val sumDeg2 = custN.join(suppN, "nk")
      .agg(sum(col("c_cnt") * col("s_cnt"))).head().getLong(0)

    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .filter(col("n_name") === "NATION_3")
      .select(col("n_nationkey").as("nk"))
    val custF = cust.filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("c_cnt"))
    val filteredCard = nat.join(custF, "nk")
      .join(suppN, "nk")
      .agg(coalesce(sum(col("c_cnt") * col("s_cnt")), lit(0L)))
      .head().getLong(0)

    println(f"[diamond] $sfDir result_rows=$rows wall=$wall%.2f s " +
      s"unfiltered_sum_deg2=$sumDeg2 filtered_card=$filteredCard")
    spark.stop()
  }
}
