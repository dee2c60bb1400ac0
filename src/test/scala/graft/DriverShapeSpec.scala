package graft

import org.apache.spark.sql.types._

/** Driver-comparability guard for every oracle'd query's OUTPUT SHAPE.
  *
  * The driver gate (CORRECTNESS_r{N}.json) reads each query's parquet
  * with pandas, sorts rows by all columns, and hashes cell strings. Two
  * whole classes of output type silently break that compare even when
  * the VALUES are identical in both engines:
  *
  *  - DECIMAL columns: a decimal landing on trailing-zero cents
  *    stringifies '1251869314.00' through Spark-parquet but
  *    '1251869314.0' through the DuckDB float canon — hash-red with
  *    bit-identical values (round 9's rel_incremental_rollup).
  *  - ARRAY/MAP/STRUCT columns: pandas sort_values cannot lexsort a
  *    list column, so the compare crashes before hashing (round 9's
  *    vec_quantize_int8).
  *
  * The repo convention is therefore: exact DECIMAL arithmetic
  * INTERNALLY, final emit as DOUBLE (or BIGINT cents); arrays emitted
  * as md5(array_join(...)) signatures or exploded to scalar rows. This
  * spec pins the convention for all current AND future oracle'd
  * queries: it builds each query's DataFrame (plan only — no job needs
  * to finish for .schema) and asserts every top-level field is an
  * atomic non-decimal type. Rows-only queries (no oracle entry) are
  * exempt: the driver only counts their rows.
  */
class DriverShapeSpec extends SparkSpec {

  private def sortableAtomic(dt: DataType): Boolean = dt match {
    case _: DecimalType => false
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  test("every oracle'd query emits only atomic, non-decimal top-level columns") {
    val oracled = SparkEntry.oracleSql.keySet
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- oracled.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.schema.fields.foreach { f =>
        if (!sortableAtomic(f.dataType))
          bad += s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"driver-incomparable output columns (cast DECIMAL to DOUBLE; " +
        s"scalarize arrays via md5(array_join) or explode):\n  " +
        bad.mkString("\n  "))
  }
}
