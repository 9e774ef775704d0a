package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing: both Spark and DuckDB emit identical
  * lowercase-hex md5, so reading the first 8 hex chars as a base-16 number is a
  * uniform u32 BOTH ENGINES COMPUTE BIT-IDENTICALLY — the numeric form of the
  * lexicographic hex-threshold trick the curation samplers use. Spark side:
  * conv(hex, 16, 10); DuckDB side: CAST('0x'||hex AS UBIGINT) (see
  * [[OracleSqlGraph]]). Never use xxhash64/hash() in oracle-gated arithmetic —
  * those are Spark-private. */
object PortableHash {

  /** u32(md5(s)) as a non-negative LongType column. */
  def md5u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** The DuckDB spelling of [[md5u32]], for oracle-SQL generators — ONE source for
    * the cross-engine contract (a width or prefix change edits both sides here). */
  def u32Sql(s: String): String =
    s"CAST(CAST(concat('0x', substr(md5($s), 1, 8)) AS UBIGINT) AS BIGINT)"
}
