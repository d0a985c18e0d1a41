package graft.functions

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll makes the native expressions SQL-callable") {
    GraftExtensions.registerAll(spark)
    assert(spark.sql(
      "SELECT vec_dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float)))").as[Double].head() === 11.0)
    assert(spark.sql(
      "SELECT sorted_long_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L))")
      .as[Long].head() === 2L)
    assert(spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b')))")
      .as[Long].collect().length === 1)
    assert(spark.sql("SELECT size(minhash_signature(array(1L, 2L), 16))")
      .as[Int].head() === 16)
    assert(spark.sql("SELECT size(window_poly_hash(array(1L, 2L, 3L, 4L), 2, 31L))")
      .as[Int].head() === 3)
    // bag semantics through SQL: 3 occurrences → 3 DISTINCT instance hashes
    assert(spark.sql("SELECT size(array_distinct(bag_instance_hashes(array(7L, 7L, 7L))))")
      .as[Int].head() === 3)
  }
}
