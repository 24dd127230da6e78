package graft
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graft.ExpressionEvaluator
case class Order(id: Long, qty: Int, price: Double, tags: Seq[String])
object EvaluatorDemo {
  def main(args: Array[String]): Unit = {
    val o = Order(7, 3, 19.99, Seq("a", "b"))
    println("revenue  = " + new ExpressionEvaluator[Order, Double](expr("qty * price")).apply(o))
    println("label    = " + new ExpressionEvaluator[Order, String](expr("concat('order-', cast(id as string), ':', array_join(tags, '+'))")).apply(o))
    println("ntags    = " + new ExpressionEvaluator[Order, Int](expr("size(tags)")).apply(o))
    // PROBE 1: no Spark runtime was ever started
    println("sessions = " + org.apache.spark.sql.SparkSession.getActiveSession)
    // SparkContext.getActive is private[spark]; active-session check above suffices
    // PROBE 2: garbage SQL
    try { new ExpressionEvaluator[Order, Int](expr("qty +* 2")) }
    catch { case e: Throwable => println("parse-err = " + e.getClass.getSimpleName + ": " + e.getMessage.linesIterator.next()) }
    // PROBE 3: unknown column
    try { new ExpressionEvaluator[Order, Int](expr("qty + nope")) }
    catch { case e: Throwable => println("resolve-err = " + e.getMessage.linesIterator.take(2).mkString(" ").take(160)) }
  }
}
