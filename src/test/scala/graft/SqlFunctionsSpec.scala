package graft

import graft.plans.GraftFunctions

/** The native kernels as plain SQL functions (registry injection). */
class SqlFunctionsSpec extends SparkSpec {

  test("vec_l2sq / vec_dot callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val r = spark
      .sql("""SELECT vec_l2sq(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS l2sq,
                     vec_dot(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS dot""")
      .head()
    assert(r.getDouble(0) === 25.0)
    assert(r.getDouble(1) === 16.0)
  }

  test("registered functions run inside whole-stage codegen over tables") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb")
    val n = spark
      .sql("SELECT vec_dot(embedding, embedding) AS sq FROM emb WHERE vec_dot(embedding, embedding) > 0")
      .count()
    assert(n > 0)
  }
}
