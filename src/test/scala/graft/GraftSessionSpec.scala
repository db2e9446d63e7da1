package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single shared engine-session definition (r17 verdict item 9)
  * and the FoldSizeOfCreateArray rule that replaced the round-17
  * session-wide InferFiltersFromGenerate exclusion (r17 verdict item 4).
  */
class GraftSessionSpec extends AnyFunSuite with SparkSpec {

  test("engineConfs carries every plan-affecting setting exactly once") {
    val confs = GraftSession.engineConfs.toMap
    assert(GraftSession.engineConfs.size == confs.size, "duplicate keys")
    assert(confs("spark.sql.extensions") == "graft.GraftExtensions")
    assert(confs("spark.sql.codegen.cache.maxEntries") == "5000")
    assert(confs(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize") == "256k",
      "local default 256k (env-overridable via SPARK_GRAFT_MIN_PART)")
    assert(confs("spark.sql.session.timeZone") == "UTC")
    assert(confs("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("no optimizer rule is globally excluded") {
    // round 17 excluded InferFiltersFromGenerate session-wide; the fix
    // is now per-expression (FoldSizeOfCreateArray), so no entry point
    // may turn a whole rule off again
    assert(!GraftSession.engineConfs.exists(
      _._1 == "spark.sql.optimizer.excludedRules"))
  }

  test("size(array(...)) folds to a literal, killing the inferred " +
      "explode filter over computed arrays") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("a")
      .select(col("a"), array(col("a") * 2, col("a") + 7).as("codes"))
      .select(col("a"), posexplode(col("codes")))
    val optimized = df.queryExecution.optimizedPlan
    val residualSize = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Size])
        => f
    }
    assert(residualSize.isEmpty,
      s"inferred size() filter survived optimization:\n$optimized")
    // semantics: the fold must not change results
    assert(df.collect().length == 4)
    val sizes = Seq(3L).toDF("a")
      .select(size(array(col("a"), col("a") - 1, col("a") + 1)).as("n"))
      .head().getInt(0)
    assert(sizes == 3)
  }
}
