package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Drives a real session built with
  * `spark.sql.extensions=…GraftSparkExtensions`: SQL-callable native
  * functions and the HOF-dot-product optimizer rewrite.
  */
class ExtensionsSpec extends AnyFunSuite {

  /** A second SparkSession over the SAME SparkContext, with extensions
    * applied (getOrCreate would silently return the plain default
    * session, so the default is cleared and restored around the test).
    */
  private def withExtendedSession(f: SparkSession => Unit): Unit = {
    val base = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sp = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // keep LocalRelation projections un-collapsed so the spec can
      // observe the optimized plan (not the pre-evaluated result)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      .withExtensions(new org.apache.spark.sql.graftfn.GraftSparkExtensions()(_))
      .getOrCreate()
    try f(sp)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("float_vec_dot and fast_md5 are SQL-callable via the extension") {
    withExtendedSession { sp =>
      import sp.implicits._
      Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
        .createOrReplaceTempView("vecs")
      val r = sp.sql("SELECT float_vec_dot(a, b) AS d, fast_md5(CAST('x' AS BINARY)) AS h FROM vecs")
        .collect().head
      assert(r.getDouble(0) == 32.0)
      assert(r.getString(1) == "9dd4e461268c8034f5c8564e155c67a6") // md5("x")
    }
  }

  test("optimizer rule rewrites the HOF dot product to the codegen'd FloatVecDot") {
    withExtendedSession { sp =>
      import sp.implicits._
      val rng = new scala.util.Random(3)
      val df = (0 until 50)
        .map(i => (i, Array.fill(16)(rng.nextFloat()), Array.fill(16)(rng.nextFloat())))
        .toDF("id", "a", "b")
      df.createOrReplaceTempView("vecs2")
      val q = sp.sql(s"SELECT id, $hofDot AS d FROM vecs2")
      assert(q.queryExecution.optimizedPlan.toString.contains("float_vec_dot"),
        q.queryExecution.optimizedPlan.toString.take(500))
      // bit-identical to both the native column API and the HOF run
      // without the extension (same products, same fold order)
      val rewritten = q.orderBy(col("id")).collect().map(_.getDouble(1))
      val native = df
        .select(col("id"), org.apache.spark.sql.graftfn.GraftExpressions
          .floatVecDot(col("a"), col("b")).as("d"))
        .orderBy(col("id")).collect().map(_.getDouble(1))
      assert(rewritten.toSeq == native.toSeq)
      val plain = SparkTestSession.spark // no extension: HOF stays interpreted
      // temp views are per-session: register the same data in the plain one
      val rows = df.collect().map(r =>
        (r.getInt(0), r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray))
      val plainDf = {
        val sqlc = plain.sqlContext
        import sqlc.implicits._
        rows.toSeq.toDF("id", "a", "b")
      }
      plainDf.createOrReplaceTempView("vecs3")
      val unrewritten = plain.sql(s"SELECT id, $hofDot AS d FROM vecs3")
      assert(!unrewritten.queryExecution.optimizedPlan.toString.contains("float_vec_dot"))
      assert(unrewritten.orderBy(col("id")).collect().map(_.getDouble(1)).toSeq
        == rewritten.toSeq)
    }
  }

  test("rewrite is null-semantics-identical on ragged and null-element arrays") {
    withExtendedSession { sp =>
      import sp.implicits._
      // ragged lengths, null elements, null arrays, empty arrays — the
      // degenerate inputs where zip_with pads/poisons with null; the
      // rewritten plan must produce the identical null-or-value per row
      val rows: Seq[(Int, Array[java.lang.Float], Array[java.lang.Float])] = Seq(
        (0, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)),
        (1, Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](4f, 5f)), // ragged
        (2, Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](4f, 5f, 6f)), // null elem
        (3, null, Array[java.lang.Float](1f)), // null array
        (4, Array[java.lang.Float](), Array[java.lang.Float]())) // empty
      val df = rows.toDF("id", "a", "b")
      df.createOrReplaceTempView("vecs5")
      val q = sp.sql(s"SELECT id, $hofDot AS d FROM vecs5")
      assert(q.queryExecution.optimizedPlan.toString.contains("float_vec_dot"),
        "rule should match nullable-element arrays now that semantics mirror")
      val rewritten = q.orderBy(col("id")).collect()
        .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      // reference: the interpreted HOF in a plain session (no extension)
      val plain = SparkTestSession.spark
      val plainDf = {
        val sqlc = plain.sqlContext
        import sqlc.implicits._
        rows.toDF("id", "a", "b")
      }
      plainDf.createOrReplaceTempView("vecs5p")
      val expected = plain.sql(s"SELECT id, $hofDot AS d FROM vecs5p")
        .orderBy(col("id")).collect()
        .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      assert(rewritten.toSeq == expected.toSeq,
        s"rewritten=${rewritten.toSeq} expected=${expected.toSeq}")
      assert(rewritten(1).isEmpty && rewritten(2).isEmpty && rewritten(3).isEmpty)
      assert(rewritten(0).contains(11.0) && rewritten(4).contains(0.0))
    }
  }

  test("rewrite leaves float products (no double cast) untouched") {
    withExtendedSession { sp =>
      import sp.implicits._
      Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
        .createOrReplaceTempView("vecs4")
      val q = sp.sql(
        "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vecs4")
      assert(!q.queryExecution.optimizedPlan.toString.contains("float_vec_dot"),
        "float-product HOF must not be rewritten (different numerics)")
    }
  }
}
