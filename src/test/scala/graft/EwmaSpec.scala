package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ewma

/** Native EWMA window function: recurrence, seeding, null handling. */
class EwmaSpec extends SparkSpec {

  import spark.implicits._

  test("ewma recurrence over an ordered partition") {
    Ewma.register(spark)
    val w = Window.partitionBy("k").orderBy("i")
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
      ("b", 1, 5.0))
      .toDF("k", "i", "x")
      .select(col("k"), col("i"), Ewma.ewma(col("x"), 0.5).over(w).as("e"))
    val a = df.filter(col("k") === "a").orderBy("i")
      .collect().map(_.getDouble(2)).toSeq
    // 10; 0.5*20+0.5*10=15; 0.5*30+0.5*15=22.5
    assert(a === Seq(10.0, 15.0, 22.5))
    val b = df.filter(col("k") === "b").collect().map(_.getDouble(2)).toSeq
    assert(b === Seq(5.0))
  }

  test("nulls carry prior state; leading nulls stay null until seeded") {
    Ewma.register(spark)
    val w = Window.orderBy("i")
    val df = Seq((1, None), (2, Some(10.0)), (3, None), (4, Some(20.0)))
      .toDF("i", "x")
      .select(col("i"), Ewma.ewma(col("x"), 0.5).over(w).as("e"))
      .orderBy("i").collect()
    assert(df(0).isNullAt(1))
    assert(df(1).getDouble(1) === 10.0)
    assert(df(2).getDouble(1) === 10.0)   // null input → state carried
    assert(df(3).getDouble(1) === 15.0)
  }

  test("sql surface: graft_ewma in a window expression") {
    Ewma.register(spark)
    Seq((1, 2.0), (2, 4.0)).toDF("i", "x").createOrReplaceTempView("t")
    val r = spark.sql(
      "SELECT graft_ewma(x, 0.5) OVER (ORDER BY i) AS e FROM t")
      .collect().map(_.getDouble(0)).toSeq
    assert(r === Seq(2.0, 3.0))
  }
}
