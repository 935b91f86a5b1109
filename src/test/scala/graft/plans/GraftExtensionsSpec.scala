package graft.plans

import graft.SparkSpec

/** The SQL registration surface: the same codegen kernels, reachable from
  * `spark.sql`. Registered on the shared live session via
  * `GraftExtensions.register` (the `withExtensions` path covers
  * construction-time wiring with the identical function catalog).
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sql = {
    GraftExtensions.register(spark)
    spark
  }

  test("graft_dot_float from SQL") {
    val r = sql.sql(
      """SELECT graft_dot_float(
        |  array(cast(1.0 as float), cast(2.0 as float)),
        |  array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(r === 11.0)
  }

  test("graft_word_shingles + graft_minhash from SQL") {
    val row = sql.sql(
      """SELECT graft_word_shingles(split('a b c d', ' '), 2) AS sh,
        |       graft_minhash(graft_word_shingles(split('a b c d', ' '), 2), 4) AS sig
        |""".stripMargin).collect()(0)
    assert(row.getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(row.getSeq[Long](1).length === 4)
  }

  test("graft_simhash from SQL matches the Column-API kernel") {
    import org.apache.spark.sql.functions._
    val viaSql = sql.sql("SELECT graft_simhash(split('the cat sat', ' ')) AS s")
      .collect()(0).getLong(0)
    val viaCol = sql.range(1)
      .select(graft.operators.Dedup.simhash(lit("the cat sat")).as("s"))
      .collect()(0).getLong(0)
    assert(viaSql === viaCol)
  }

  test("graft_word_set_count from SQL") {
    val n = sql.sql(
      """SELECT graft_word_set_count(
        |  split('the cat and the hat', ' '), 'the', 'and') AS n""".stripMargin)
      .collect()(0).getInt(0)
    assert(n === 3)
  }

  test("non-literal shingle width is rejected") {
    val e = intercept[Exception] {
      sql.sql("SELECT graft_word_shingles(split('a b', ' '), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getCause != null)
  }

  test("wrong arity raises a clean signature error, not IndexOutOfBounds") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // too few args
    val e1 = intercept[Exception] { sql.sql("SELECT graft_simhash()").collect() }
    assert(messages(e1).exists(_.contains("graft_simhash(words)")), s"got: $e1")
    // extra args must error, not be silently ignored
    val e2 = intercept[Exception] {
      sql.sql("SELECT graft_string_deletions('a', 'b')").collect()
    }
    assert(messages(e2).exists(_.contains("graft_string_deletions(s)")),
      s"got: $e2")
    val e3 = intercept[Exception] {
      sql.sql("SELECT graft_dot_float(array(1.0f))").collect()
    }
    assert(messages(e3).exists(_.contains("graft_dot_float(a, b)")), s"got: $e3")
    // variadic: needs the array plus at least one word
    val e4 = intercept[Exception] {
      sql.sql("SELECT graft_word_set_count(split('a', ' '))").collect()
    }
    assert(messages(e4).exists(_.contains("graft_word_set_count")), s"got: $e4")
  }
}
