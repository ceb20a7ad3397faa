package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** D5 — guarded client-side materialization. */
class ClientSpec extends SparkSpec {

  private val data = df((1 to 50).map(i => Row(i.toLong, s"v$i")), "id BIGINT, s STRING")

  test("fetchScalar returns the one-row verdict") {
    val cnt: Long = Client.fetchScalar(data.agg(count(lit(1)).as("cnt")), "cnt")
    assert(cnt == 50L)
  }

  test("fetchScalar refuses empty and multi-row results") {
    intercept[Client.UnboundedFetchException] {
      Client.fetchScalar[Long](data.filter("id < 0").agg(count(lit(1)).as("c")).filter("c < 0"), "c")
    }
    intercept[Client.UnboundedFetchException] {
      Client.fetchScalar[Long](data, "id")
    }
  }

  test("fetchColumn returns bounded lists and refuses unbounded ones") {
    val vals = Client.fetchColumn[String](
      data.filter("id <= 3").orderBy("id"), "s", maxRows = 10)
    assert(vals == Seq("v1", "v2", "v3"))
    intercept[Client.UnboundedFetchException] {
      Client.fetchColumn[String](data, "s", maxRows = 10)
    }
  }
}
