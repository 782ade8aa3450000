package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One registered engine operation: a named DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL for the
  * driver's oracle compare. Column aliases MUST match between `fn` output and
  * `sql` — the driver hashes column-name-sorted values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None
)

object Q {

  /** Load a large oracle SQL statement shipped as a classpath resource
    * (src/main/resources/graft/oracles/<name>.sql). Used for the
    * machine-generated DuckDB twins of the hash-pipeline operators, which
    * are too large to inline readably (see tools/gen_dedup_oracles.py).
    */
  def oracleResource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/oracles/$name.sql")
    require(in != null, s"missing oracle resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}

/** Shared numeric helpers that keep aggregation deterministic across engines
  * and across partition orders (a distributed-correctness requirement, not
  * just an oracle trick): money columns in the testdata are exactly
  * 2-decimal, so DECIMAL(12,2) casts are lossless and decimal sums are exact
  * regardless of reduction order. Final results are surfaced as doubles.
  */
object Num {
  val Money: DecimalType = DecimalType(12, 2)

  /** column as exact 2-decimal money value */
  def m(c: Column): Column = c.cast(Money)

  /** exact sum of a 2-decimal column, surfaced as double */
  def dsum(c: Column): Column = sum(m(c)).cast(DoubleType)

  /** l_extendedprice * (1 - l_discount), exact decimal */
  def discPrice: Column = m(col("l_extendedprice")) * (lit(1) - m(col("l_discount")))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal */
  def charge: Column = discPrice * (lit(1) + m(col("l_tax")))
}
