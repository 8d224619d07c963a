package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Runtime bloom-filter join pruning — the shuffle-volume lever for
  * selective fact⟕dim joins once the dim side is too big to broadcast: the
  * optimizer builds a bloom filter over the (filtered) creation side's join
  * keys and injects a `might_contain` predicate into the application side's
  * scan, so fact rows that cannot match die BEFORE the shuffle instead of
  * after it. At 100 TB that is the difference between shuffling the whole
  * fact table and shuffling the selectivity-matched slice. The engine gets
  * this from Catalyst (InjectRuntimeFilter) for free — this spec pins that
  * our session configuration actually lets it fire, and that the injection
  * responds to its kill switch (so the assertion is causal, not
  * coincidental plan text). */
class RuntimeFilterSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  /** A selective dim (filtered orders) joined to the fact (lineitem) as a
    * SHUFFLE join — broadcast disabled, since a broadcast join already
    * prunes at the hash table and needs no bloom filter. */
  private def factDimJoin(): DataFrame = {
    val li = Tables.read(spark, sf0001, "lineitem")
    val ord = Tables.read(spark, sf0001, "orders").filter("o_totalprice > 400000")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
  }

  private def planWith(bloomEnabled: Boolean): String = {
    val c = spark.conf
    c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloomEnabled.toString)
    // local fixture sizes sit far below the production thresholds (10 MB
    // creation side / 10 GB application side); relax them so the local plan
    // exercises the same rule a cluster-scale plan would
    c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try factDimJoin().queryExecution.optimizedPlan.toString
    finally {
      c.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      c.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      c.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a selective shuffle join gets a runtime bloom filter on the fact side") {
    planWith(bloomEnabled = true) should include("might_contain")
  }

  test("the injection is causal: disabling the rule removes the filter") {
    planWith(bloomEnabled = false) should not include "might_contain"
  }
}
