package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

class HitsProfileSpec extends SparkTestBase {
  test("decompose hits internals at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import spark.implicits._
    for (pass <- 1 to 2) {
      val edges = t(s"p$pass build edges df") {
        graft.queries.Tables(spark, dir, "orders")
          .join(graft.queries.Tables(spark, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
      }
      val w = t(s"p$pass w plan")(edges.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("wt")).persist(StorageLevel.MEMORY_AND_DISK))
      t(s"p$pass w.count")(w.count())
      val pairs = t(s"p$pass collect")(
        w.select(col("src"), col("dst"), col("wt")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      t(s"p$pass unpersist")(w.unpersist(blocking = false))
      def micro(x: Double): Long = java.math.BigDecimal.valueOf(x * 1e12)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      val got = t(s"p$pass local loop") {
        def sweepDriver(scores: collection.Map[Long, Double],
                        key: ((Long, Long, Long)) => Long,
                        out: ((Long, Long, Long)) => Long) = {
          val ms = collection.mutable.LongMap.empty[Long]
          scores.foreach { case (id, s) => ms(id) = micro(s) }
          val raw = collection.mutable.LongMap.empty[Long]
          pairs.foreach { p =>
            raw(out(p)) = raw.getOrElse(out(p), 0L) + p._3 * ms(key(p))
          }
          var tt = 0L; raw.valuesIterator.foreach(tt += _)
          raw.map { case (id, c) => id -> c.toDouble / tt.toDouble }: collection.Map[Long, Double]
        }
        val srcs = pairs.map(_._1).distinct
        var h: collection.Map[Long, Double] =
          collection.Map(srcs.map(_ -> 1.0 / srcs.length): _*)
        var a: collection.Map[Long, Double] = collection.Map.empty
        for (_ <- 0 until 5) { a = sweepDriver(h, _._1, _._2); h = sweepDriver(a, _._2, _._1) }
        (h, a)
      }
      t(s"p$pass toDF+count") {
        (got._1.toSeq.map { case (id, s) => ("hub", id, s) } ++
          got._2.toSeq.map { case (id, s) => ("authority", id, s) })
          .toDF("kind", "id", "s")
          .select(col("kind"), col("id"), round(col("s"), 6).as("score"))
          .orderBy(col("score").desc).limit(24).count()
      }
    }
  }
}
