package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's 5-job Glue ETL diamond (`pharma-etl-pipeline`,
  * Glue-etl-pipeline.py:64-129) instantiated over the testdata star schema:
  *
  * {{{
  *   product_mastering ──┐
  *   hcp_brick ──────────┼─> sales_enrichment ─> beta_layer
  *   brick_territory ────┘
  * }}}
  *
  * Jobs 1–3 are independent (fan-in barrier before job 4 —
  * Glue-etl-pipeline.py:125-129); the barrier is enforced by data
  * dependency in [[StageGraph]].
  */
object PharmaEtl {

  def graph(spark: SparkSession, sfDir: String): StageGraph = StageGraph(Seq(
    Stage("product_mastering", Nil)(_ =>
      Tables.part(spark, sfDir)
        .filter(col("p_retailprice") > 0)
        .select(col("p_partkey"), trim(col("p_brand")).as("brand"),
          col("p_retailprice"))),

    Stage("hcp_brick", Nil)(_ =>
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("wealth_brick"))),

    Stage("brick_territory", Nil)(_ => {
      val nation = Tables.nation(spark, sfDir)
      val region = Tables.region(spark, sfDir)
      nation.join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    }),

    // Job 4 — the fan-in: facts enriched with all three upstream outputs.
    // lineitem⨝orders is the one big shuffle (co-keyed on orderkey).
    // hcp_brick (customer-derived) and product_mastering (part-derived)
    // scale with the data — at 100 TB neither fits an executor, so they
    // join via shuffle (AQE may still choose broadcast at runtime when
    // small). Only nation-derived brick_territory (25 rows at any scale)
    // keeps the explicit broadcast hint.
    Stage("sales_enrichment", Seq("product_mastering", "hcp_brick", "brick_territory"))(up => {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(up("hcp_brick"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(up("brick_territory")), col("c_nationkey") === col("n_nationkey"))
        .join(up("product_mastering"), col("l_partkey") === col("p_partkey"))
        .select(col("r_name"), col("brand"), col("wealth_brick"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_revenue"))
    }),

    Stage("beta_layer", Seq("sales_enrichment"))(up =>
      up("sales_enrichment")
        .groupBy(col("r_name").as("region_name"), col("brand"))
        .agg(count(lit(1)).as("line_count"),
          // exact decimal accumulation — see Stages.martSalesPerformance
          round(sum(col("net_revenue").cast("decimal(18,4)")), 2)
            .cast("double").as("revenue")))))

  /** Run the diamond and return the beta layer, deterministically ordered. */
  def betaLayer(spark: SparkSession, sfDir: String): DataFrame =
    graph(spark, sfDir).run()("beta_layer").orderBy("region_name", "brand")
}
